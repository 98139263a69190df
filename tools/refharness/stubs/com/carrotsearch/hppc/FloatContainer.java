package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.FloatCursor;

public interface FloatContainer extends Iterable<FloatCursor> {
  int size();
}
