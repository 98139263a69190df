package com.carrotsearch.hppc.cursors;

public final class DoubleIntCursor {
  public int index;
  public double key;
  public int value;
}
