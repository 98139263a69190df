package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.LongCursor;
import java.util.*;

public class LongHashSet implements Iterable<LongCursor> {
  private final LinkedHashSet<Long> set = new LinkedHashSet<>();

  public LongHashSet() {}
  public LongHashSet(int expected) {}

  public boolean add(long v) { return set.add(v); }
  public boolean contains(long v) { return set.contains(v); }
  public boolean remove(long v) { return set.remove(v); }
  public int size() { return set.size(); }
  public boolean isEmpty() { return set.isEmpty(); }
  public void clear() { set.clear(); }
  public long[] toArray() {
    long[] out = new long[set.size()];
    int i = 0;
    for (Long v : set) out[i++] = v;
    return out;
  }

  public Iterator<LongCursor> iterator() {
    final Iterator<Long> it = set.iterator();
    return new Iterator<LongCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public LongCursor next() {
        LongCursor c = new LongCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
