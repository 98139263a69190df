package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.ObjectObjectCursor;
import com.carrotsearch.hppc.cursors.ObjectCursor;
import java.util.*;

public class ObjectObjectHashMap<K, V> implements Iterable<ObjectObjectCursor<K, V>> {
  private final ArrayList<K> keyList = new ArrayList<>();
  private final ArrayList<V> valList = new ArrayList<>();
  private final HashMap<K, Integer> pos = new HashMap<>();

  public ObjectObjectHashMap() {}
  public ObjectObjectHashMap(int expected) {}

  public V put(K key, V value) {
    Integer p = pos.get(key);
    if (p != null) { V old = valList.get(p); valList.set(p, value); return old; }
    pos.put(key, keyList.size()); keyList.add(key); valList.add(value);
    return null;
  }

  public V get(K key) { Integer p = pos.get(key); return p == null ? null : valList.get(p); }
  public V getOrDefault(K key, V dflt) { Integer p = pos.get(key); return p == null ? dflt : valList.get(p); }
  public boolean containsKey(K key) { return pos.containsKey(key); }
  public int size() { return keyList.size(); }
  public boolean isEmpty() { return keyList.isEmpty(); }
  public void clear() { keyList.clear(); valList.clear(); pos.clear(); }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<ObjectCursor<K>> {
    public int size() { return keyList.size(); }
    public Object[] toArray() { return keyList.toArray(); }
    public Iterator<ObjectCursor<K>> iterator() {
      final Iterator<K> it = keyList.iterator();
      return new Iterator<ObjectCursor<K>>() {
        int i = 0;
        public boolean hasNext() { return it.hasNext(); }
        public ObjectCursor<K> next() {
          ObjectCursor<K> c = new ObjectCursor<>(); c.index = i++; c.value = it.next(); return c;
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

  public Iterator<ObjectObjectCursor<K, V>> iterator() {
    return new Iterator<ObjectObjectCursor<K, V>>() {
      int i = 0;
      public boolean hasNext() { return i < keyList.size(); }
      public ObjectObjectCursor<K, V> next() {
        ObjectObjectCursor<K, V> c = new ObjectObjectCursor<>();
        c.index = i; c.key = keyList.get(i); c.value = valList.get(i); i++;
        return c;
      }
    };
  }
}
