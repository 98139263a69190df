package com.carrotsearch.hppc.cursors;

public final class IntShortCursor {
  public int index;
  public int key;
  public short value;
}
