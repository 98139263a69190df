package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.FloatCursor;
import java.util.*;

public class FloatArrayList implements Iterable<com.carrotsearch.hppc.cursors.FloatCursor>, FloatContainer {
  private final ArrayList<Float> list = new ArrayList<>();

  public FloatArrayList() {}
  public FloatArrayList(int expected) {}

  public void add(float v) { list.add(v); }
  public void add(float... vs) { for (float v : vs) list.add(v); }
  public void addAll(FloatArrayList other) {
    for (int i = 0; i < other.size(); i++) list.add(other.get(i));
  }
  public float get(int i) { return list.get(i); }
  public void set(int i, float v) { list.set(i, v); }
  public int size() { return list.size(); }
  public boolean isEmpty() { return list.isEmpty(); }
  public void clear() { list.clear(); }
  public boolean contains(float v) { return list.contains(v); }
  public float[] toArray() {
    float[] out = new float[list.size()];
    for (int i = 0; i < out.length; i++) out[i] = list.get(i);
    return out;
  }

  public Iterator<FloatCursor> iterator() {
    final Iterator<Float> it = list.iterator();
    return new Iterator<FloatCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public FloatCursor next() {
        FloatCursor c = new FloatCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
