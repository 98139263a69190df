package com.carrotsearch.hppc.cursors;

public final class LongIntCursor {
  public int index;
  public long key;
  public int value;
}
