package com.carrotsearch.hppc.cursors;

public final class ShortCursor {
  public int index;
  public short value;
}
