package com.carrotsearch.hppc.cursors;

public final class IntIntCursor {
  public int index;
  public int key;
  public int value;
}
