package com.carrotsearch.hppc.cursors;

public final class ObjectObjectCursor<K, V> {
  public int index;
  public K key;
  public V value;
}
