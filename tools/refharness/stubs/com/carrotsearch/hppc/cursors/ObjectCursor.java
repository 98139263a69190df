package com.carrotsearch.hppc.cursors;

public final class ObjectCursor<T> {
  public int index;
  public T value;
}
