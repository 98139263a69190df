package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntShortCursor;
import com.carrotsearch.hppc.cursors.IntCursor;
import com.carrotsearch.hppc.cursors.ShortCursor;
import java.util.*;

/** Array-backed stand-in for hppc's IntShortHashMap: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class IntShortHashMap implements IntShortMap, Iterable<IntShortCursor> {
  public int[] keys = new int[8];
  public short[] values = new short[8];
  private int count = 0;
  private final HashMap<Integer, Integer> pos = new HashMap<>();

  public IntShortHashMap() {}
  public IntShortHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public short put(int key, short value) {
    Integer p = pos.get(key);
    if (p != null) { short old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return (short) 0;
  }

  public short get(int key) {
    Integer p = pos.get(key);
    return p == null ? (short) 0 : values[p];
  }

  public short getOrDefault(int key, short dflt) {
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }

  public short putOrAdd(int key, short putValue, short incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (short) (values[p] + incrValue); return values[p];
  }

  public short addTo(int key, short incr) { return putOrAdd(key, incr, incr); }

  public boolean containsKey(int key) { return pos.containsKey(key); }

  public short remove(int key) {
    Integer p = pos.remove(key);
    if (p == null) return (short) 0;
    short old = values[p];
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

  public void putAll(IntShortHashMap other) {
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }

  public int indexOf(int key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public short indexGet(int index) { return values[index]; }
  public void indexReplace(int index, short value) { values[index] = value; }
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

  public class ValuesView implements Iterable<ShortCursor> {
    public int size() { return count; }
    public short[] toArray() { return Arrays.copyOf(values, count); }
    public Iterator<ShortCursor> iterator() {
      return new Iterator<ShortCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public ShortCursor next() {
          ShortCursor c = new ShortCursor(); c.index = i; c.value = values[i]; i++; return c;
        }
      };
    }
  }

  public Iterator<IntShortCursor> iterator() {
    return new Iterator<IntShortCursor>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      public IntShortCursor next() {
        IntShortCursor c = new IntShortCursor();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
