"""Generate minimal dependency stubs to compile & run the PUBLIC
reference (/root/reference, patrickzib/SFA) for instrumentation.

The container has JTransforms/JLargeArrays/commons-math3/kryo jars
(bundled with pyspark) but not hppc/liblinear/libsvm. The classifiers
we instrument (BOSS ensemble) never call liblinear/libsvm, and hppc is
a primitive-collections library whose API surface here is small — so
functional HashMap-backed stubs reproduce the reference's results
exactly (iteration order only affects hash-order tie-breaks, which the
reference's own goldens treat as noise within DELTA=0.05).

Usage: python tools/refharness/gen_stubs.py  → writes stubs/ next to
this file. Then tools/refharness/build.sh compiles the reference +
stubs + Instrument.java into /tmp/refbuild.
"""

from __future__ import annotations

import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "stubs")

PRIM = {
    "Int": "int",
    "Long": "long",
    "Double": "double",
    "Float": "float",
    "Short": "short",
}
ZERO = {
    "int": "0",
    "long": "0L",
    "double": "0.0",
    "float": "0.0f",
    "short": "(short) 0",
}
BOX = {
    "int": "Integer",
    "long": "Long",
    "double": "Double",
    "float": "Float",
    "short": "Short",
}


def write(path: str, body: str) -> None:
    full = os.path.join(OUT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(body)


def prim_cursor(k: str) -> str:
    t = PRIM[k]
    return f"""package com.carrotsearch.hppc.cursors;

public final class {k}Cursor {{
  public int index;
  public {t} value;
}}
"""


def kv_cursor(k: str, v: str) -> str:
    kt, vt = PRIM[k], PRIM[v]
    return f"""package com.carrotsearch.hppc.cursors;

public final class {k}{v}Cursor {{
  public int index;
  public {kt} key;
  public {vt} value;
}}
"""


def obj_cursor() -> str:
    return """package com.carrotsearch.hppc.cursors;

public final class ObjectCursor<T> {
  public int index;
  public T value;
}
"""


def obj_kv_cursor(v: str | None) -> str:
    if v is None:  # ObjectObjectCursor
        return """package com.carrotsearch.hppc.cursors;

public final class ObjectObjectCursor<K, V> {
  public int index;
  public K key;
  public V value;
}
"""
    vt = PRIM[v]
    return f"""package com.carrotsearch.hppc.cursors;

public final class Object{v}Cursor<K> {{
  public int index;
  public K key;
  public {vt} value;
}}
"""


def prim_obj_cursor(k: str) -> str:
    kt = PRIM[k]
    return f"""package com.carrotsearch.hppc.cursors;

public final class {k}ObjectCursor<V> {{
  public int index;
  public {kt} key;
  public V value;
}}
"""


def kv_map(k: str, v: str) -> str:
    kt, vt = PRIM[k], PRIM[v]
    kb, vb = BOX[kt], BOX[vt]
    kz, vz = ZERO[kt], ZERO[vt]
    cls = f"{k}{v}HashMap"
    cur = f"{k}{v}Cursor"
    vc_impl = ", FloatContainer" if v == "Float" else ""
    return f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{cur};
import com.carrotsearch.hppc.cursors.{k}Cursor;
import com.carrotsearch.hppc.cursors.{v}Cursor;
import java.util.*;

/** Array-backed stand-in for hppc's {cls}: cursor.index is the dense
 * slot position and the public keys/values arrays are the LIVE storage
 * (the reference writes map.values[cursor.index] directly). */
public class {cls} implements {k}{v}Map, Iterable<{cur}> {{
  public {kt}[] keys = new {kt}[8];
  public {vt}[] values = new {vt}[8];
  private int count = 0;
  private final HashMap<{kb}, Integer> pos = new HashMap<>();

  public {cls}() {{}}
  public {cls}(int expected) {{}}

  private void grow() {{
    if (count == keys.length) {{
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }}
  }}

  public {vt} put({kt} key, {vt} value) {{
    Integer p = pos.get(key);
    if (p != null) {{ {vt} old = values[p]; values[p] = value; return old; }}
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return {vz};
  }}

  public {vt} get({kt} key) {{
    Integer p = pos.get(key);
    return p == null ? {vz} : values[p];
  }}

  public {vt} getOrDefault({kt} key, {vt} dflt) {{
    Integer p = pos.get(key);
    return p == null ? dflt : values[p];
  }}

  public {vt} putOrAdd({kt} key, {vt} putValue, {vt} incrValue) {{
    Integer p = pos.get(key);
    if (p == null) {{ put(key, putValue); return putValue; }}
    values[p] = ({vt}) (values[p] + incrValue); return values[p];
  }}

  public {vt} addTo({kt} key, {vt} incr) {{ return putOrAdd(key, incr, incr); }}

  public boolean containsKey({kt} key) {{ return pos.containsKey(key); }}

  public {vt} remove({kt} key) {{
    Integer p = pos.remove(key);
    if (p == null) return {vz};
    {vt} old = values[p];
    int last = count - 1;
    if (p != last) {{
      keys[p] = keys[last]; values[p] = values[last]; pos.put(keys[p], p);
    }}
    count--;
    return old;
  }}

  public int size() {{ return count; }}
  public boolean isEmpty() {{ return count == 0; }}
  public void clear() {{ count = 0; pos.clear(); }}

  public void putAll({cls} other) {{
    for (int i = 0; i < other.size(); i++) put(other.keys[i], other.values[i]);
  }}

  public int indexOf({kt} key) {{ Integer p = pos.get(key); return p == null ? -1 : p; }}
  public {vt} indexGet(int index) {{ return values[index]; }}
  public void indexReplace(int index, {vt} value) {{ values[index] = value; }}
  public boolean indexExists(int index) {{ return index >= 0; }}

  public KeysView keys() {{ return new KeysView(); }}
  public ValuesView values() {{ return new ValuesView(); }}

  public class KeysView implements Iterable<{k}Cursor> {{
    public int size() {{ return count; }}
    public {kt}[] toArray() {{ return Arrays.copyOf(keys, count); }}
    public Iterator<{k}Cursor> iterator() {{
      return new Iterator<{k}Cursor>() {{
        int i = 0;
        public boolean hasNext() {{ return i < count; }}
        public {k}Cursor next() {{
          {k}Cursor c = new {k}Cursor(); c.index = i; c.value = keys[i]; i++; return c;
        }}
      }};
    }}
  }}

  public class ValuesView implements Iterable<{v}Cursor>{vc_impl} {{
    public int size() {{ return count; }}
    public {vt}[] toArray() {{ return Arrays.copyOf(values, count); }}
    public Iterator<{v}Cursor> iterator() {{
      return new Iterator<{v}Cursor>() {{
        int i = 0;
        public boolean hasNext() {{ return i < count; }}
        public {v}Cursor next() {{
          {v}Cursor c = new {v}Cursor(); c.index = i; c.value = values[i]; i++; return c;
        }}
      }};
    }}
  }}

  public Iterator<{cur}> iterator() {{
    return new Iterator<{cur}>() {{
      int i = 0;
      public boolean hasNext() {{ return i < count; }}
      public {cur} next() {{
        {cur} c = new {cur}();
        c.index = i; c.key = keys[i]; c.value = values[i]; i++;
        return c;
      }}
    }};
  }}
}}
"""


def obj_v_map(v: str) -> str:
    vt = PRIM[v]
    vb, vz = BOX[vt], ZERO[vt]
    vc_impl = ""
    cls = f"Object{v}HashMap"
    cur = f"Object{v}Cursor"
    return f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{cur};
import com.carrotsearch.hppc.cursors.ObjectCursor;
import com.carrotsearch.hppc.cursors.{v}Cursor;
import java.util.*;

/** Array-backed: cursor.index is the slot and public values is live
 * storage (MUSE writes bob.values[cursor.index] = 0 directly). */
public class {cls}<K> implements Iterable<{cur}<K>> {{
  public Object[] keys = new Object[8];
  public {vt}[] values = new {vt}[8];
  private int count = 0;
  private final HashMap<K, Integer> pos = new HashMap<>();

  public {cls}() {{}}
  public {cls}(int expected) {{}}

  private void grow() {{
    if (count == keys.length) {{
      keys = Arrays.copyOf(keys, keys.length * 2);
      values = Arrays.copyOf(values, values.length * 2);
    }}
  }}

  public {vt} put(K key, {vt} value) {{
    Integer p = pos.get(key);
    if (p != null) {{ {vt} old = values[p]; values[p] = value; return old; }}
    grow(); pos.put(key, count); keys[count] = key; values[count] = value; count++;
    return {vz};
  }}

  public {vt} get(K key) {{ Integer p = pos.get(key); return p == null ? {vz} : values[p]; }}
  public {vt} getOrDefault(K key, {vt} dflt) {{ Integer p = pos.get(key); return p == null ? dflt : values[p]; }}
  public {vt} putOrAdd(K key, {vt} putValue, {vt} incrValue) {{
    Integer p = pos.get(key);
    if (p == null) {{ put(key, putValue); return putValue; }}
    values[p] = ({vt}) (values[p] + incrValue); return values[p];
  }}
  public {vt} addTo(K key, {vt} incr) {{ return putOrAdd(key, incr, incr); }}
  public boolean containsKey(K key) {{ return pos.containsKey(key); }}
  public int size() {{ return count; }}
  public boolean isEmpty() {{ return count == 0; }}
  public void clear() {{ count = 0; pos.clear(); }}
  @SuppressWarnings("unchecked")
  public void putAll({cls}<? extends K> other) {{
    for (int i = 0; i < other.size(); i++) put((K) other.keys[i], other.values[i]);
  }}

  public int indexOf(K key) {{ Integer p = pos.get(key); return p == null ? -1 : p; }}
  public {vt} indexGet(int index) {{ return values[index]; }}
  public void indexReplace(int index, {vt} value) {{ values[index] = value; }}

  public KeysView keys() {{ return new KeysView(); }}
  public ValuesView values() {{ return new ValuesView(); }}

  public class KeysView implements Iterable<ObjectCursor<K>> {{
    public int size() {{ return count; }}
    public Object[] toArray() {{ return Arrays.copyOf(keys, count); }}
    public Iterator<ObjectCursor<K>> iterator() {{
      return new Iterator<ObjectCursor<K>>() {{
        int i = 0;
        public boolean hasNext() {{ return i < count; }}
        @SuppressWarnings("unchecked")
        public ObjectCursor<K> next() {{
          ObjectCursor<K> c = new ObjectCursor<>(); c.index = i; c.value = (K) keys[i]; i++; return c;
        }}
      }};
    }}
  }}

  public class ValuesView implements Iterable<{v}Cursor>{vc_impl} {{
    public int size() {{ return count; }}
    public {vt}[] toArray() {{ return Arrays.copyOf(values, count); }}
    public Iterator<{v}Cursor> iterator() {{
      return new Iterator<{v}Cursor>() {{
        int i = 0;
        public boolean hasNext() {{ return i < count; }}
        public {v}Cursor next() {{
          {v}Cursor c = new {v}Cursor(); c.index = i; c.value = values[i]; i++; return c;
        }}
      }};
    }}
  }}

  public Iterator<{cur}<K>> iterator() {{
    return new Iterator<{cur}<K>>() {{
      int i = 0;
      public boolean hasNext() {{ return i < count; }}
      @SuppressWarnings("unchecked")
      public {cur}<K> next() {{
        {cur}<K> c = new {cur}<>();
        c.index = i; c.key = (K) keys[i]; c.value = values[i]; i++;
        return c;
      }}
    }};
  }}
}}
"""


def prim_obj_map(k: str) -> str:
    kt = PRIM[k]
    kb = BOX[kt]
    cls = f"{k}ObjectHashMap"
    cur = f"{k}ObjectCursor"
    return f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{cur};
import com.carrotsearch.hppc.cursors.{k}Cursor;
import com.carrotsearch.hppc.cursors.ObjectCursor;
import java.util.*;

public class {cls}<V> implements Iterable<{cur}<V>> {{
  private final ArrayList<{kb}> keyList = new ArrayList<>();
  private final ArrayList<V> valList = new ArrayList<>();
  private final HashMap<{kb}, Integer> pos = new HashMap<>();

  public {cls}() {{}}
  public {cls}(int expected) {{}}

  public V put({kt} key, V value) {{
    Integer p = pos.get(key);
    if (p != null) {{ V old = valList.get(p); valList.set(p, value); return old; }}
    pos.put(key, keyList.size()); keyList.add(key); valList.add(value);
    return null;
  }}

  public V get({kt} key) {{ Integer p = pos.get(key); return p == null ? null : valList.get(p); }}
  public V getOrDefault({kt} key, V dflt) {{ Integer p = pos.get(key); return p == null ? dflt : valList.get(p); }}
  public boolean containsKey({kt} key) {{ return pos.containsKey(key); }}
  public int size() {{ return keyList.size(); }}
  public boolean isEmpty() {{ return keyList.isEmpty(); }}
  public void clear() {{ keyList.clear(); valList.clear(); pos.clear(); }}
  public int indexOf({kt} key) {{ Integer p = pos.get(key); return p == null ? -1 : p; }}
  public V indexGet(int index) {{ return valList.get(index); }}
  public void indexReplace(int index, V value) {{ valList.set(index, value); }}

  public KeysView keys() {{ return new KeysView(); }}
  public ValuesView values() {{ return new ValuesView(); }}

  public class KeysView implements Iterable<{k}Cursor> {{
    public int size() {{ return keyList.size(); }}
    public {kt}[] toArray() {{
      {kt}[] out = new {kt}[keyList.size()];
      for (int i = 0; i < out.length; i++) out[i] = keyList.get(i);
      return out;
    }}
    public Iterator<{k}Cursor> iterator() {{
      final Iterator<{kb}> it = keyList.iterator();
      return new Iterator<{k}Cursor>() {{
        int i = 0;
        public boolean hasNext() {{ return it.hasNext(); }}
        public {k}Cursor next() {{
          {k}Cursor c = new {k}Cursor(); c.index = i++; c.value = it.next(); return c;
        }}
      }};
    }}
  }}

  public class ValuesView implements Iterable<ObjectCursor<V>> {{
    public int size() {{ return valList.size(); }}
    public Iterator<ObjectCursor<V>> iterator() {{
      final Iterator<V> it = valList.iterator();
      return new Iterator<ObjectCursor<V>>() {{
        int i = 0;
        public boolean hasNext() {{ return it.hasNext(); }}
        public ObjectCursor<V> next() {{
          ObjectCursor<V> c = new ObjectCursor<>(); c.index = i++; c.value = it.next(); return c;
        }}
      }};
    }}
  }}

  public Iterator<{cur}<V>> iterator() {{
    return new Iterator<{cur}<V>>() {{
      int i = 0;
      public boolean hasNext() {{ return i < keyList.size(); }}
      public {cur}<V> next() {{
        {cur}<V> c = new {cur}<>();
        c.index = i; c.key = keyList.get(i); c.value = valList.get(i); i++;
        return c;
      }}
    }};
  }}
}}
"""


def obj_obj_map() -> str:
    return """package com.carrotsearch.hppc;

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
"""


def prim_set(k: str) -> str:
    kt = PRIM[k]
    kb = BOX[kt]
    return f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{k}Cursor;
import java.util.*;

public class {k}HashSet implements Iterable<{k}Cursor> {{
  private final LinkedHashSet<{kb}> set = new LinkedHashSet<>();

  public {k}HashSet() {{}}
  public {k}HashSet(int expected) {{}}

  public boolean add({kt} v) {{ return set.add(v); }}
  public boolean contains({kt} v) {{ return set.contains(v); }}
  public boolean remove({kt} v) {{ return set.remove(v); }}
  public int size() {{ return set.size(); }}
  public boolean isEmpty() {{ return set.isEmpty(); }}
  public void clear() {{ set.clear(); }}
  public {kt}[] toArray() {{
    {kt}[] out = new {kt}[set.size()];
    int i = 0;
    for ({kb} v : set) out[i++] = v;
    return out;
  }}

  public Iterator<{k}Cursor> iterator() {{
    final Iterator<{kb}> it = set.iterator();
    return new Iterator<{k}Cursor>() {{
      int i = 0;
      public boolean hasNext() {{ return it.hasNext(); }}
      public {k}Cursor next() {{
        {k}Cursor c = new {k}Cursor(); c.index = i++; c.value = it.next(); return c;
      }}
    }};
  }}
}}
"""


def obj_set() -> str:
    return """package com.carrotsearch.hppc;

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
"""


def prim_list(k: str, extra_iface: str = "") -> str:
    kt = PRIM[k]
    kb = BOX[kt]
    impl = f"implements Iterable<com.carrotsearch.hppc.cursors.{k}Cursor>{extra_iface}"
    return f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{k}Cursor;
import java.util.*;

public class {k}ArrayList {impl} {{
  private final ArrayList<{kb}> list = new ArrayList<>();

  public {k}ArrayList() {{}}
  public {k}ArrayList(int expected) {{}}

  public void add({kt} v) {{ list.add(v); }}
  public void add({kt}... vs) {{ for ({kt} v : vs) list.add(v); }}
  public void addAll({k}ArrayList other) {{
    for (int i = 0; i < other.size(); i++) list.add(other.get(i));
  }}
  public {kt} get(int i) {{ return list.get(i); }}
  public void set(int i, {kt} v) {{ list.set(i, v); }}
  public int size() {{ return list.size(); }}
  public boolean isEmpty() {{ return list.isEmpty(); }}
  public void clear() {{ list.clear(); }}
  public boolean contains({kt} v) {{ return list.contains(v); }}
  public {kt}[] toArray() {{
    {kt}[] out = new {kt}[list.size()];
    for (int i = 0; i < out.length; i++) out[i] = list.get(i);
    return out;
  }}

  public Iterator<{k}Cursor> iterator() {{
    final Iterator<{kb}> it = list.iterator();
    return new Iterator<{k}Cursor>() {{
      int i = 0;
      public boolean hasNext() {{ return it.hasNext(); }}
      public {k}Cursor next() {{
        {k}Cursor c = new {k}Cursor(); c.index = i++; c.value = it.next(); return c;
      }}
    }};
  }}
}}
"""


def main() -> None:
    # cursors
    for k in PRIM:
        write(f"com/carrotsearch/hppc/cursors/{k}Cursor.java", prim_cursor(k))
    for k, v in [
        ("Int", "Int"), ("Int", "Float"), ("Int", "Short"),
        ("Long", "Int"), ("Long", "Double"), ("Long", "Long"),
        ("Double", "Double"), ("Double", "Int"),
    ]:
        write(f"com/carrotsearch/hppc/cursors/{k}{v}Cursor.java", kv_cursor(k, v))
    write("com/carrotsearch/hppc/cursors/ObjectCursor.java", obj_cursor())
    write("com/carrotsearch/hppc/cursors/ObjectObjectCursor.java", obj_kv_cursor(None))
    write("com/carrotsearch/hppc/cursors/ObjectIntCursor.java", obj_kv_cursor("Int"))
    for k in ("Long", "Double"):
        write(f"com/carrotsearch/hppc/cursors/{k}ObjectCursor.java", prim_obj_cursor(k))

    # map interfaces (the reference declares variables as {K}{V}Map)
    for k, v in [
        ("Int", "Int"), ("Int", "Float"), ("Int", "Short"),
        ("Long", "Int"), ("Long", "Double"), ("Long", "Long"),
        ("Double", "Double"), ("Double", "Int"),
    ]:
        kt, vt = PRIM[k], PRIM[v]
        write(
            f"com/carrotsearch/hppc/{k}{v}Map.java",
            f"""package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.{k}{v}Cursor;

public interface {k}{v}Map extends Iterable<{k}{v}Cursor> {{
  {vt} put({kt} key, {vt} value);
  {vt} get({kt} key);
  {vt} getOrDefault({kt} key, {vt} dflt);
  {vt} putOrAdd({kt} key, {vt} putValue, {vt} incrValue);
  {vt} addTo({kt} key, {vt} incr);
  boolean containsKey({kt} key);
  int size();
  boolean isEmpty();
  void clear();
}}
""",
        )

    # maps
    for k, v in [
        ("Int", "Int"), ("Int", "Float"), ("Int", "Short"),
        ("Long", "Int"), ("Long", "Double"), ("Long", "Long"),
        ("Double", "Double"), ("Double", "Int"),
    ]:
        write(f"com/carrotsearch/hppc/{k}{v}HashMap.java", kv_map(k, v))
    write("com/carrotsearch/hppc/ObjectIntHashMap.java", obj_v_map("Int"))
    write("com/carrotsearch/hppc/ObjectObjectHashMap.java", obj_obj_map())
    for k in ("Long", "Double"):
        write(f"com/carrotsearch/hppc/{k}ObjectHashMap.java", prim_obj_map(k))

    # sets / lists
    write("com/carrotsearch/hppc/LongHashSet.java", prim_set("Long"))
    write("com/carrotsearch/hppc/ObjectHashSet.java", obj_set())
    for k in ("Double", "Int"):
        write(f"com/carrotsearch/hppc/{k}ArrayList.java", prim_list(k))
    write(
        "com/carrotsearch/hppc/FloatArrayList.java",
        prim_list("Float", extra_iface=", FloatContainer"),
    )
    write(
        "com/carrotsearch/hppc/FloatContainer.java",
        """package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.FloatCursor;

public interface FloatContainer extends Iterable<FloatCursor> {
  int size();
}
""",
    )
    write(
        "com/carrotsearch/hppc/IntArrayDeque.java",
        """package com.carrotsearch.hppc;

import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.*;

public class IntArrayDeque implements Iterable<IntCursor> {
  private final ArrayDeque<Integer> dq = new ArrayDeque<>();

  public IntArrayDeque() {}
  public IntArrayDeque(int expected) {}

  public void addLast(int v) { dq.addLast(v); }
  public void addFirst(int v) { dq.addFirst(v); }
  public int removeFirst() { return dq.removeFirst(); }
  public int removeLast() { return dq.removeLast(); }
  public int size() { return dq.size(); }
  public boolean isEmpty() { return dq.isEmpty(); }
  public void clear() { dq.clear(); }

  public Iterator<IntCursor> iterator() {
    final Iterator<Integer> it = dq.iterator();
    return new Iterator<IntCursor>() {
      int i = 0;
      public boolean hasNext() { return it.hasNext(); }
      public IntCursor next() {
        IntCursor c = new IntCursor(); c.index = i++; c.value = it.next(); return c;
      }
    };
  }
}
""",
    )

    # liblinear stubs (BOSS ensemble never calls these; compile-only)
    ll = "de/bwaldvogel/liblinear"
    write(
        f"{ll}/Feature.java",
        """package de.bwaldvogel.liblinear;

public interface Feature {
  int getIndex();
  double getValue();
  void setValue(double value);
}
""",
    )
    write(
        f"{ll}/FeatureNode.java",
        """package de.bwaldvogel.liblinear;

public class FeatureNode implements Feature {
  public final int index;
  public double value;

  public FeatureNode(int index, double value) { this.index = index; this.value = value; }
  public int getIndex() { return index; }
  public double getValue() { return value; }
  public void setValue(double value) { this.value = value; }
}
""",
    )
    write(
        f"{ll}/Model.java",
        """package de.bwaldvogel.liblinear;

public class Model implements java.io.Serializable {
  public int getNrClass() { throw new UnsupportedOperationException("liblinear stub"); }
  public int[] getLabels() { throw new UnsupportedOperationException("liblinear stub"); }
}
""",
    )
    write(
        f"{ll}/SolverType.java",
        """package de.bwaldvogel.liblinear;

public enum SolverType { L2R_LR, L2R_LR_DUAL, L2R_L2LOSS_SVC, L1R_LR, MCSVM_CS }
""",
    )
    write(
        f"{ll}/Parameter.java",
        """package de.bwaldvogel.liblinear;

public class Parameter {
  public Parameter(SolverType solver, double C, int maxIters, double eps) {}
  public Parameter(SolverType solver, double C, double eps) {}
  public Parameter(SolverType solver, double C, double eps, double p) {}
}
""",
    )
    write(
        f"{ll}/Problem.java",
        """package de.bwaldvogel.liblinear;

public class Problem {
  public int l;
  public int n;
  public double bias;
  public Feature[][] x;
  public double[] y;
}
""",
    )
    write(
        f"{ll}/Linear.java",
        """package de.bwaldvogel.liblinear;

public class Linear {
  public static Model train(Problem problem, Parameter parameter) {
    throw new UnsupportedOperationException("liblinear stub: not available offline");
  }
  public static double predict(Model model, Feature[] x) {
    throw new UnsupportedOperationException("liblinear stub");
  }
  public static double predictProbability(Model model, Feature[] x, double[] probs) {
    throw new UnsupportedOperationException("liblinear stub");
  }
  public static void resetRandom() {}
  public static void disableDebugOutput() {}
}
""",
    )

    # libsvm stubs (TEASER-only; compile-only)
    write(
        "libsvm/svm_parameter.java",
        """package libsvm;

public class svm_parameter implements java.io.Serializable {
  public static final int C_SVC = 0, NU_SVC = 1, ONE_CLASS = 2, EPSILON_SVR = 3, NU_SVR = 4;
  public static final int LINEAR = 0, POLY = 1, RBF = 2, SIGMOID = 3, PRECOMPUTED = 4;
  public int svm_type, kernel_type, degree;
  public double gamma, coef0, cache_size, eps, C, nu, p;
  public int shrinking, probability, nr_weight;
  public int[] weight_label;
  public double[] weight;
}
""",
    )
    write(
        "libsvm/svm_node.java",
        """package libsvm;

public class svm_node implements java.io.Serializable {
  public int index;
  public double value;
}
""",
    )
    write(
        "libsvm/svm_problem.java",
        """package libsvm;

public class svm_problem implements java.io.Serializable {
  public int l;
  public double[] y;
  public svm_node[][] x;
}
""",
    )
    write(
        "libsvm/svm_model.java",
        """package libsvm;

public class svm_model implements java.io.Serializable {
  public svm_parameter param;
}
""",
    )
    write(
        "libsvm/svm_print_interface.java",
        """package libsvm;

public interface svm_print_interface {
  void print(String s);
}
""",
    )
    write(
        "libsvm/svm.java",
        """package libsvm;

public class svm {
  public static final java.util.Random rand = new java.util.Random();

  public static String svm_check_parameter(svm_problem p, svm_parameter param) { return null; }
  public static svm_model svm_train(svm_problem p, svm_parameter param) {
    throw new UnsupportedOperationException("libsvm stub: not available offline");
  }
  public static double svm_predict(svm_model model, svm_node[] x) {
    throw new UnsupportedOperationException("libsvm stub");
  }
  public static void svm_set_print_string_function(svm_print_interface f) {}
}
""",
    )
    print(f"stubs written under {OUT}")


if __name__ == "__main__":
    main()
