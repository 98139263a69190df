package com.carrotsearch.hppc.cursors;

public final class LongObjectCursor<V> {
  public int index;
  public long key;
  public V value;
}
