package com.carrotsearch.hppc.cursors;

public final class LongCursor {
  public int index;
  public long value;
}
