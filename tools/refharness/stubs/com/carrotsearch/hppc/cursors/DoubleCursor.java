package com.carrotsearch.hppc.cursors;

public final class DoubleCursor {
  public int index;
  public double value;
}
