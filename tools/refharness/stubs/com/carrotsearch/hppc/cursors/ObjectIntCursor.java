package com.carrotsearch.hppc.cursors;

public final class ObjectIntCursor<K> {
  public int index;
  public K key;
  public int value;
}
