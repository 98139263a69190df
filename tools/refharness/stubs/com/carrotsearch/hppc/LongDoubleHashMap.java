package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongDoubleCursor;
import com.carrotsearch.hppc.cursors.LongCursor;
import com.carrotsearch.hppc.cursors.DoubleCursor;
import java.util.*;

/** Array-backed stand-in for hppc's LongDoubleHashMap: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class LongDoubleHashMap implements LongDoubleMap, Iterable<LongDoubleCursor> {
  public long[] keys = new long[8];
  public double[] values = new double[8];
  private int count = 0;
  private final HashMap<Long, Integer> pos = new HashMap<>();

  public LongDoubleHashMap() {}
  public LongDoubleHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public double put(long key, double value) {
    Integer p = pos.get(key);
    if (p != null) { double old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return 0.0;
  }

  public double get(long key) {
    Integer p = pos.get(key);
    return p == null ? 0.0 : values[p];
  }

  public double getOrDefault(long key, double dflt) {
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }

  public double putOrAdd(long key, double putValue, double incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (double) (values[p] + incrValue); return values[p];
  }

  public double addTo(long key, double incr) { return putOrAdd(key, incr, incr); }

  public boolean containsKey(long key) { return pos.containsKey(key); }

  public double remove(long key) {
    Integer p = pos.remove(key);
    if (p == null) return 0.0;
    double old = values[p];
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

  public void putAll(LongDoubleHashMap other) {
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }

  public int indexOf(long key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public double indexGet(int index) { return values[index]; }
  public void indexReplace(int index, double value) { values[index] = value; }
  public boolean indexExists(int index) { return index >= 0; }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<LongCursor> {
    public int size() { return count; }
    public long[] toArray() { return Arrays.copyOf(keys, count); }
    public Iterator<LongCursor> iterator() {
      return new Iterator<LongCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public LongCursor next() {
          LongCursor c = new LongCursor(); c.index = i; c.value = keys[i]; i++; return c;
        }
      };
    }
  }

  public class ValuesView implements Iterable<DoubleCursor> {
    public int size() { return count; }
    public double[] toArray() { return Arrays.copyOf(values, count); }
    public Iterator<DoubleCursor> iterator() {
      return new Iterator<DoubleCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public DoubleCursor next() {
          DoubleCursor c = new DoubleCursor(); c.index = i; c.value = values[i]; i++; return c;
        }
      };
    }
  }

  public Iterator<LongDoubleCursor> iterator() {
    return new Iterator<LongDoubleCursor>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      public LongDoubleCursor next() {
        LongDoubleCursor c = new LongDoubleCursor();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
