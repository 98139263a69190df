package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.DoubleIntCursor;
import com.carrotsearch.hppc.cursors.DoubleCursor;
import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.*;

/** Array-backed stand-in for hppc's DoubleIntHashMap: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class DoubleIntHashMap implements DoubleIntMap, Iterable<DoubleIntCursor> {
  public double[] keys = new double[8];
  public int[] values = new int[8];
  private int count = 0;
  private final HashMap<Double, Integer> pos = new HashMap<>();

  public DoubleIntHashMap() {}
  public DoubleIntHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public int put(double key, int value) {
    Integer p = pos.get(key);
    if (p != null) { int old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return 0;
  }

  public int get(double key) {
    Integer p = pos.get(key);
    return p == null ? 0 : values[p];
  }

  public int getOrDefault(double key, int dflt) {
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }

  public int putOrAdd(double key, int putValue, int incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (int) (values[p] + incrValue); return values[p];
  }

  public int addTo(double key, int incr) { return putOrAdd(key, incr, incr); }

  public boolean containsKey(double key) { return pos.containsKey(key); }

  public int remove(double key) {
    Integer p = pos.remove(key);
    if (p == null) return 0;
    int old = values[p];
    int last = count - 1;
    if (p != last) {
      keys[p] = keys[last]; values[p] = values[last]; pos.put(keys[p], p);
    }
    count--;
    return old;
  }

  public int size() { return count; }
  public boolean isEmpty() { return count == 0; }
  public void clear() { count = 0; pos.clear(); }

  public void putAll(DoubleIntHashMap other) {
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }

  public int indexOf(double key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public int indexGet(int index) { return values[index]; }
  public void indexReplace(int index, int value) { values[index] = value; }
  public boolean indexExists(int index) { return index >= 0; }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<DoubleCursor> {
    public int size() { return count; }
    public double[] toArray() { return Arrays.copyOf(keys, count); }
    public Iterator<DoubleCursor> iterator() {
      return new Iterator<DoubleCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public DoubleCursor next() {
          DoubleCursor c = new DoubleCursor(); c.index = i; c.value = keys[i]; i++; return c;
        }
      };
    }
  }

  public class ValuesView implements Iterable<IntCursor> {
    public int size() { return count; }
    public int[] toArray() { return Arrays.copyOf(values, count); }
    public Iterator<IntCursor> iterator() {
      return new Iterator<IntCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public IntCursor next() {
          IntCursor c = new IntCursor(); c.index = i; c.value = values[i]; i++; return c;
        }
      };
    }
  }

  public Iterator<DoubleIntCursor> iterator() {
    return new Iterator<DoubleIntCursor>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      public DoubleIntCursor next() {
        DoubleIntCursor c = new DoubleIntCursor();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
