package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntFloatCursor;

public interface IntFloatMap extends Iterable<IntFloatCursor> {
  float put(int key, float value);
  float get(int key);
  float getOrDefault(int key, float dflt);
  float putOrAdd(int key, float putValue, float incrValue);
  float addTo(int key, float incr);
  boolean containsKey(int key);
  int size();
  boolean isEmpty();
  void clear();
}
