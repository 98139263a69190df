package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.DoubleCursor;
import java.util.*;

public class DoubleArrayList implements Iterable<com.carrotsearch.hppc.cursors.DoubleCursor> {
  private final ArrayList<Double> list = new ArrayList<>();

  public DoubleArrayList() {}
  public DoubleArrayList(int expected) {}

  public void add(double v) { list.add(v); }
  public void add(double... vs) { for (double v : vs) list.add(v); }
  public void addAll(DoubleArrayList other) {
    for (int i = 0; i < other.size(); i++) list.add(other.get(i));
  }
  public double get(int i) { return list.get(i); }
  public void set(int i, double v) { list.set(i, v); }
  public int size() { return list.size(); }
  public boolean isEmpty() { return list.isEmpty(); }
  public void clear() { list.clear(); }
  public boolean contains(double v) { return list.contains(v); }
  public double[] toArray() {
    double[] out = new double[list.size()];
    for (int i = 0; i < out.length; i++) out[i] = list.get(i);
    return out;
  }

  public Iterator<DoubleCursor> iterator() {
    final Iterator<Double> it = list.iterator();
    return new Iterator<DoubleCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public DoubleCursor next() {
        DoubleCursor c = new DoubleCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
