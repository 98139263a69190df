package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.DoubleIntCursor;

public interface DoubleIntMap extends Iterable<DoubleIntCursor> {
  int put(double key, int value);
  int get(double key);
  int getOrDefault(double key, int dflt);
  int putOrAdd(double key, int putValue, int incrValue);
  int addTo(double key, int incr);
  boolean containsKey(double key);
  int size();
  boolean isEmpty();
  void clear();
}
