package com.carrotsearch.hppc.cursors;

public final class IntFloatCursor {
  public int index;
  public int key;
  public float value;
}
