package com.carrotsearch.hppc.cursors;

public final class LongLongCursor {
  public int index;
  public long key;
  public long value;
}
