package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongLongCursor;

public interface LongLongMap extends Iterable<LongLongCursor> {
  long put(long key, long value);
  long get(long key);
  long getOrDefault(long key, long dflt);
  long putOrAdd(long key, long putValue, long incrValue);
  long addTo(long key, long incr);
  boolean containsKey(long key);
  int size();
  boolean isEmpty();
  void clear();
}
