package com.carrotsearch.hppc.cursors;

public final class IntCursor {
  public int index;
  public int value;
}
