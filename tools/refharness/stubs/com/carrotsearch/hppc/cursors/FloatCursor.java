package com.carrotsearch.hppc.cursors;

public final class FloatCursor {
  public int index;
  public float value;
}
