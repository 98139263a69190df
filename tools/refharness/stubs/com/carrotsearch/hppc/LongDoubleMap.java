package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongDoubleCursor;

public interface LongDoubleMap extends Iterable<LongDoubleCursor> {
  double put(long key, double value);
  double get(long key);
  double getOrDefault(long key, double dflt);
  double putOrAdd(long key, double putValue, double incrValue);
  double addTo(long key, double incr);
  boolean containsKey(long key);
  int size();
  boolean isEmpty();
  void clear();
}
