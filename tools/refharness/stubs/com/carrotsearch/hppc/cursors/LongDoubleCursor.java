package com.carrotsearch.hppc.cursors;

public final class LongDoubleCursor {
  public int index;
  public long key;
  public double value;
}
