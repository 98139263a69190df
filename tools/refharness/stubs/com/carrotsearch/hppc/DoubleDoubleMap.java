package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.DoubleDoubleCursor;

public interface DoubleDoubleMap extends Iterable<DoubleDoubleCursor> {
  double put(double key, double value);
  double get(double key);
  double getOrDefault(double key, double dflt);
  double putOrAdd(double key, double putValue, double incrValue);
  double addTo(double key, double incr);
  boolean containsKey(double key);
  int size();
  boolean isEmpty();
  void clear();
}
