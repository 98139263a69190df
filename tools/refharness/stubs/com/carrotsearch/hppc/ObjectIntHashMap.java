package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.ObjectIntCursor;
import com.carrotsearch.hppc.cursors.ObjectCursor;
import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.*;

/** Array-backed: cursor.index is the slot and public values is live
 * storage (MUSE writes bob.values[cursor.index] = 0 directly). */
public class ObjectIntHashMap<K> implements Iterable<ObjectIntCursor<K>> {
  public Object[] keys = new Object[8];
  public int[] values = new int[8];
  private int count = 0;
  private final HashMap<K, Integer> pos = new HashMap<>();

  public ObjectIntHashMap() {}
  public ObjectIntHashMap(int expected) {}

  private void grow() {
    if (count == keys.length) {
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }
  }

  public int put(K key, int value) {
    Integer p = pos.get(key);
    if (p != null) { int old = values[p]; values[p] = value; return old; }
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return 0;
  }

  public int get(K key) { Integer p = pos.get(key); return p == null ? 0 : values[p]; }
  public int getOrDefault(K key, int dflt) { Integer p = pos.get(key); return p == null ? dflt : values[p]; }
  public int putOrAdd(K key, int putValue, int incrValue) {
    Integer p = pos.get(key);
    if (p == null) { put(key, putValue); return putValue; }
    values[p] = (int) (values[p] + incrValue); return values[p];
  }
  public int addTo(K key, int incr) { return putOrAdd(key, incr, incr); }
  public boolean containsKey(K key) { return pos.containsKey(key); }
  public int size() { return count; }
  public boolean isEmpty() { return count == 0; }
  public void clear() { count = 0; pos.clear(); }
  @SuppressWarnings("unchecked")
  public void putAll(ObjectIntHashMap<? extends K> other) {
    for (int i = 0; i < other.size(); i++) put((K) other.keys[i], other.values[i]);
  }

  public int indexOf(K key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public int indexGet(int index) { return values[index]; }
  public void indexReplace(int index, int value) { values[index] = value; }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<ObjectCursor<K>> {
    public int size() { return count; }
    public Object[] toArray() { return Arrays.copyOf(keys, count); }
    public Iterator<ObjectCursor<K>> iterator() {
      return new Iterator<ObjectCursor<K>>() {
        int i = 0;
        public boolean hasNext() { return i < count; }
        @SuppressWarnings("unchecked")
        public ObjectCursor<K> next() {
          ObjectCursor<K> c = new ObjectCursor<>(); c.index = i; c.value = (K) keys[i]; i++; return c;
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

  public Iterator<ObjectIntCursor<K>> iterator() {
    return new Iterator<ObjectIntCursor<K>>() {
      int i = 0;
      public boolean hasNext() { return i < count; }
      @SuppressWarnings("unchecked")
      public ObjectIntCursor<K> next() {
        ObjectIntCursor<K> c = new ObjectIntCursor<>();
        c.index = i; c.key = (K) keys[i]; c.value = values[i]; i++;
        return c;
      }
    };
  }
}
