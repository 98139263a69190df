package com.carrotsearch.hppc.cursors;

public final class DoubleDoubleCursor {
  public int index;
  public double key;
  public double value;
}
