package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongLongCursor;
import com.carrotsearch.hppc.cursors.LongCursor;
import com.carrotsearch.hppc.cursors.LongCursor;
import java.util.*;

/** Array-backed stand-in for hppc's LongLongHashMap: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class LongLongHashMap implements LongLongMap, Iterable<LongLongCursor> {
  public long[] keys = new long[8];
  public long[] values = new long[8];
  private int count = 0;
  private final HashMap<Long, Integer> pos = new HashMap<>();

  public LongLongHashMap() {}
  public LongLongHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public long put(long key, long value) {
    Integer p = pos.get(key);
    if (p != null) { long old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return 0L;
  }

  public long get(long key) {
    Integer p = pos.get(key);
    return p == null ? 0L : values[p];
  }

  public long getOrDefault(long key, long dflt) {
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }

  public long putOrAdd(long key, long putValue, long incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (long) (values[p] + incrValue); return values[p];
  }

  public long addTo(long key, long incr) { return putOrAdd(key, incr, incr); }

  public boolean containsKey(long key) { return pos.containsKey(key); }

  public long remove(long key) {
    Integer p = pos.remove(key);
    if (p == null) return 0L;
    long old = values[p];
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

  public void putAll(LongLongHashMap other) {
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }

  public int indexOf(long key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public long indexGet(int index) { return values[index]; }
  public void indexReplace(int index, long value) { values[index] = value; }
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

  public class ValuesView implements Iterable<LongCursor> {
    public int size() { return count; }
    public long[] toArray() { return Arrays.copyOf(values, count); }
    public Iterator<LongCursor> iterator() {
      return new Iterator<LongCursor>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        public LongCursor next() {
          LongCursor c = new LongCursor(); c.index = i; c.value = values[i]; i++; return c;
        }
      };
    }
  }

  public Iterator<LongLongCursor> iterator() {
    return new Iterator<LongLongCursor>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      public LongLongCursor next() {
        LongLongCursor c = new LongLongCursor();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
