package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntFloatCursor;
import com.carrotsearch.hppc.cursors.IntCursor;
import com.carrotsearch.hppc.cursors.FloatCursor;
import java.util.*;

/** Array-backed stand-in for hppc's IntFloatHashMap: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class IntFloatHashMap implements IntFloatMap, Iterable<IntFloatCursor> {
  public int[] keys = new int[8];
  public float[] values = new float[8];
  private int count = 0;
  private final HashMap<Integer, Integer> pos = new HashMap<>();

  public IntFloatHashMap() {}
  public IntFloatHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public float put(int key, float value) {
    Integer p = pos.get(key);
    if (p != null) { float old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return 0.0f;
  }

  public float get(int key) {
    Integer p = pos.get(key);
    return p == null ? 0.0f : values[p];
  }

  public float getOrDefault(int key, float dflt) {
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }

  public float putOrAdd(int key, float putValue, float incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (float) (values[p] + incrValue); return values[p];
  }

  public float addTo(int key, float incr) { return putOrAdd(key, incr, incr); }

  public boolean containsKey(int key) { return pos.containsKey(key); }

  public float remove(int key) {
    Integer p = pos.remove(key);
    if (p == null) return 0.0f;
    float old = values[p];
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

  public void putAll(IntFloatHashMap other) {
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }

  public int indexOf(int key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public float indexGet(int index) { return values[index]; }
  public void indexReplace(int index, float value) { values[index] = value; }
  public boolean indexExists(int index) { return index >= 0; }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<IntCursor> {
    public int size() { return count; }
    public int[] toArray() { return Arrays.copyOf(keys, count); }
    public Iterator<IntCursor> iterator() {
      return new Iterator<IntCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public IntCursor next() {
          IntCursor c = new IntCursor(); c.index = i; c.value = keys[i]; i++; return c;
        }
      };
    }
  }

  public class ValuesView implements Iterable<FloatCursor>, FloatContainer {
    public int size() { return count; }
    public float[] toArray() { return Arrays.copyOf(values, count); }
    public Iterator<FloatCursor> iterator() {
      return new Iterator<FloatCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public FloatCursor next() {
          FloatCursor c = new FloatCursor(); c.index = i; c.value = values[i]; i++; return c;
        }
      };
    }
  }

  public Iterator<IntFloatCursor> iterator() {
    return new Iterator<IntFloatCursor>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      public IntFloatCursor next() {
        IntFloatCursor c = new IntFloatCursor();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
