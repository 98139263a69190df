package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.*;

public class IntArrayList implements Iterable<com.carrotsearch.hppc.cursors.IntCursor> {
  private final ArrayList<Integer> list = new ArrayList<>();

  public IntArrayList() {}
  public IntArrayList(int expected) {}

  public void add(int v) { list.add(v); }
  public void add(int... vs) { for (int v : vs) list.add(v); }
  public void addAll(IntArrayList other) {
    for (int i = 0; i < other.size(); i++) list.add(other.get(i));
  }
  public int get(int i) { return list.get(i); }
  public void set(int i, int v) { list.set(i, v); }
  public int size() { return list.size(); }
  public boolean isEmpty() { return list.isEmpty(); }
  public void clear() { list.clear(); }
  public boolean contains(int v) { return list.contains(v); }
  public int[] toArray() {
    int[] out = new int[list.size()];
    for (int i = 0; i < out.length; i++) out[i] = list.get(i);
    return out;
  }

  public Iterator<IntCursor> iterator() {
    final Iterator<Integer> it = list.iterator();
    return new Iterator<IntCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public IntCursor next() {
        IntCursor c = new IntCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
