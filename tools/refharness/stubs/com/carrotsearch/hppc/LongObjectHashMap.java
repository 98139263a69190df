package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongObjectCursor;
import com.carrotsearch.hppc.cursors.LongCursor;
import com.carrotsearch.hppc.cursors.ObjectCursor;
import java.util.*;

public class LongObjectHashMap<V> implements Iterable<LongObjectCursor<V>> {
  private final ArrayList<Long> keyList = new ArrayList<>();
  private final ArrayList<V> valList = new ArrayList<>();
  private final HashMap<Long, Integer> pos = new HashMap<>();

  public LongObjectHashMap() {}
  public LongObjectHashMap(int expected) {}

  public V put(long key, V value) {
    Integer p = pos.get(key);
    if (p != null) { V old = valList.get(p); valList.set(p, value); return old; }
    pos.put(key, keyList.size()); keyList.add(key); valList.add(value);
    return null;
  }

  public V get(long key) { Integer p = pos.get(key); return p == null ? null : valList.get(p); }
  public V getOrDefault(long key, V dflt) { Integer p = pos.get(key); return p == null ? dflt : valList.get(p); }
  public boolean containsKey(long key) { return pos.containsKey(key); }
  public int size() { return keyList.size(); }
  public boolean isEmpty() { return keyList.isEmpty(); }
  public void clear() { keyList.clear(); valList.clear(); pos.clear(); }
  public int indexOf(long key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public V indexGet(int index) { return valList.get(index); }
  public void indexReplace(int index, V value) { valList.set(index, value); }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<LongCursor> {
    public int size() { return keyList.size(); }
    public long[] toArray() {
      long[] out = new long[keyList.size()];
      for (int i = 0; i < out.length; i++) out[i] = keyList.get(i);
      return out;
    }
    public Iterator<LongCursor> iterator() {
      final Iterator<Long> it = keyList.iterator();
      return new Iterator<LongCursor>() {
        int i = 0;
        public boolean hasNext() { return it.hasNext(); }
        public LongCursor next() {
          LongCursor c = new LongCursor(); c.index = i++; c.value = it.next(); return c;
        }
      };
    }
  }

  public class ValuesView implements Iterable<ObjectCursor<V>> {
    public int size() { return valList.size(); }
    public Iterator<ObjectCursor<V>> iterator() {
      final Iterator<V> it = valList.iterator();
      return new Iterator<ObjectCursor<V>>() {
        int i = 0;
        public boolean hasNext() { return it.hasNext(); }
        public ObjectCursor<V> next() {
          ObjectCursor<V> c = new ObjectCursor<>(); c.index = i++; c.value = it.next(); return c;
        }
      };
    }
  }

  public Iterator<LongObjectCursor<V>> iterator() {
    return new Iterator<LongObjectCursor<V>>() {
      int i = 0;
      public boolean hasNext() { return i < keyList.size(); }
      public LongObjectCursor<V> next() {
        LongObjectCursor<V> c = new LongObjectCursor<>();
        c.index = i; c.key = keyList.get(i); c.value = valList.get(i); i++;
        return c;
      }
    };
  }
}
