package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.*;

public class IntArrayDeque implements Iterable<IntCursor> {
  private final ArrayDeque<Integer> dq = new ArrayDeque<>();

  public IntArrayDeque() {}
  public IntArrayDeque(int expected) {}

  public void addLast(int v) { dq.addLast(v); }
  public void addFirst(int v) { dq.addFirst(v); }
  public int removeFirst() { return dq.removeFirst(); }
  public int removeLast() { return dq.removeLast(); }
  public int size() { return dq.size(); }
  public boolean isEmpty() { return dq.isEmpty(); }
  public void clear() { dq.clear(); }

  public Iterator<IntCursor> iterator() {
    final Iterator<Integer> it = dq.iterator();
    return new Iterator<IntCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public IntCursor next() {
        IntCursor c = new IntCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
