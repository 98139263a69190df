package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.DoubleObjectCursor;
import com.carrotsearch.hppc.cursors.DoubleCursor;
import com.carrotsearch.hppc.cursors.ObjectCursor;
import java.util.*;

public class DoubleObjectHashMap<V> implements Iterable<DoubleObjectCursor<V>> {
  private final ArrayList<Double> keyList = new ArrayList<>();
  private final ArrayList<V> valList = new ArrayList<>();
  private final HashMap<Double, Integer> pos = new HashMap<>();

  public DoubleObjectHashMap() {}
  public DoubleObjectHashMap(int expected) {}

  public V put(double key, V value) {
    Integer p = pos.get(key);
    if (p != null) { V old = valList.get(p); valList.set(p, value); return old; }
    pos.put(key, keyList.size()); keyList.add(key); valList.add(value);
    return null;
  }

  public V get(double key) { Integer p = pos.get(key); return p == null ? null : valList.get(p); }
  public V getOrDefault(double key, V dflt) { Integer p = pos.get(key); return p == null ? dflt : valList.get(p); }
  public boolean containsKey(double key) { return pos.containsKey(key); }
  public int size() { return keyList.size(); }
  public boolean isEmpty() { return keyList.isEmpty(); }
  public void clear() { keyList.clear(); valList.clear(); pos.clear(); }
  public int indexOf(double key) { Integer p = pos.get(key); return p == null ? -1 : p; }
  public V indexGet(int index) { return valList.get(index); }
  public void indexReplace(int index, V value) { valList.set(index, value); }

  public KeysView keys() { return new KeysView(); }
  public ValuesView values() { return new ValuesView(); }

  public class KeysView implements Iterable<DoubleCursor> {
    public int size() { return keyList.size(); }
    public double[] toArray() {
      double[] out = new double[keyList.size()];
      for (int i = 0; i < out.length; i++) out[i] = keyList.get(i);
      return out;
    }
    public Iterator<DoubleCursor> iterator() {
      final Iterator<Double> it = keyList.iterator();
      return new Iterator<DoubleCursor>() {
        int i = 0;
        public boolean hasNext() { return it.hasNext(); }
        public DoubleCursor next() {
          DoubleCursor c = new DoubleCursor(); c.index = i++; c.value = it.next(); return c;
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

  public Iterator<DoubleObjectCursor<V>> iterator() {
    return new Iterator<DoubleObjectCursor<V>>() {
      int i = 0;
      public boolean hasNext() { return i < keyList.size(); }
      public DoubleObjectCursor<V> next() {
        DoubleObjectCursor<V> c = new DoubleObjectCursor<>();
        c.index = i; c.key = keyList.get(i); c.value = valList.get(i); i++;
        return c;
      }
    };
  }
}
