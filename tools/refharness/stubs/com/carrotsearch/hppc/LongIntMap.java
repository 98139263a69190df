package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongIntCursor;

public interface LongIntMap extends Iterable<LongIntCursor> {
  int put(long key, int value);
  int get(long key);
  int getOrDefault(long key, int dflt);
  int putOrAdd(long key, int putValue, int incrValue);
  int addTo(long key, int incr);
  boolean containsKey(long key);
  int size();
  boolean isEmpty();
  void clear();
}
