package com.carrotsearch.hppc.cursors;

public final class DoubleObjectCursor<V> {
  public int index;
  public double key;
  public V value;
}
