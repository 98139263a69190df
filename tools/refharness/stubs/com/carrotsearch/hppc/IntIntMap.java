package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntIntCursor;

public interface IntIntMap extends Iterable<IntIntCursor> {
  int put(int key, int value);
  int get(int key);
  int getOrDefault(int key, int dflt);
  int putOrAdd(int key, int putValue, int incrValue);
  int addTo(int key, int incr);
  boolean containsKey(int key);
  int size();
  boolean isEmpty();
  void clear();
}
