package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.ObjectCursor;
import java.util.*;

public class ObjectHashSet<K> implements Iterable<ObjectCursor<K>> {
  private final LinkedHashSet<K> set = new LinkedHashSet<>();

  public ObjectHashSet() {}
  public ObjectHashSet(int expected) {}

  public boolean add(K v) { return set.add(v); }
  public boolean contains(K v) { return set.contains(v); }
  public boolean remove(K v) { return set.remove(v); }
  public int size() { return set.size(); }
  public boolean isEmpty() { return set.isEmpty(); }
  public void clear() { set.clear(); }
  public Object[] toArray() { return set.toArray(); }

  public Iterator<ObjectCursor<K>> iterator() {
    final Iterator<K> it = set.iterator();
    return new Iterator<ObjectCursor<K>>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public ObjectCursor<K> next() {
        ObjectCursor<K> c = new ObjectCursor<>(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
