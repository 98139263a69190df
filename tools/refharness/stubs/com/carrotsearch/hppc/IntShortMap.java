package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntShortCursor;

public interface IntShortMap extends Iterable<IntShortCursor> {
  short put(int key, short value);
  short get(int key);
  short getOrDefault(int key, short dflt);
  short putOrAdd(int key, short putValue, short incrValue);
  short addTo(int key, short incr);
  boolean containsKey(int key);
  int size();
  boolean isEmpty();
  void clear();
}
