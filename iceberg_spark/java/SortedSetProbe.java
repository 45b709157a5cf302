package org.iceberg_spark.util;

import java.util.Arrays;
import java.util.List;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Sorted-array membership probes for the equality-delete NOT-IN fast
 * path. A Catalyst {@code StaticInvoke} of these methods is a single
 * expression node: whole-stage codegen emits one primitive
 * binary-search call per row — no per-literal expression tree (15k
 * literals cost ~0.5s of analysis per query), no boxed-set probe
 * (Scala immutable Set measures ~220ns/row), and no join stage. The
 * key array rides the plan as an ObjectType literal, so it serializes
 * to executors like any other expression state.
 *
 * <p>Engine-original utility (no reference counterpart: the reference
 * applies equality deletes with an in-memory StructLikeSet per task —
 * core/src/main/java/org/apache/iceberg/deletes/Deletes.java — which
 * is exactly the per-row hash-probe shape this reproduces inside
 * Spark's codegen).
 */
public final class SortedSetProbe {
  private SortedSetProbe() {}

  public static boolean containsLong(long[] sorted, long v) {
    return Arrays.binarySearch(sorted, v) >= 0;
  }

  public static boolean containsUtf8(UTF8String[] sorted, UTF8String v) {
    return Arrays.binarySearch(sorted, v) >= 0;
  }

  // last (paths array identity, file path) -> ordinal, per thread: scan
  // tasks read one file at a time, so consecutive rows almost always
  // carry the same path — the memo turns the per-row path lookup into
  // one byte-compare. The memoized path is a defensive COPY (row values
  // may alias reusable buffers).
  private static final ThreadLocal<Object[]> LAST_ORD =
      ThreadLocal.withInitial(() -> new Object[3]);

  /**
   * Position-delete run-coverage probe: TRUE iff {@code pos} of the
   * file named {@code path} falls inside a deleted run. Runs are
   * encoded as {@code (fileOrdinal << 40) | position} with the
   * ordinal from {@code paths}' sort order; {@code runStarts} and
   * {@code runEnds} are aligned, globally ascending (runs are
   * disjoint and the ordinal dominates the encoding). One expression
   * node replaces a per-file chain of path-equality string compares —
   * the per-task delete-index probe shape of a bitmap position-delete
   * index, inside whole-stage codegen.
   */
  public static boolean coveredFilePos(
      UTF8String[] paths, long[] runStarts, long[] runEnds,
      UTF8String path, long pos) {
    Object[] memo = LAST_ORD.get();
    int ord;
    if (memo[0] == paths && path.equals(memo[1])) {
      ord = (Integer) memo[2];
    } else {
      ord = Arrays.binarySearch(paths, path);
      memo[0] = paths;
      memo[1] = UTF8String.fromString(path.toString());
      memo[2] = ord;
    }
    if (ord < 0) {
      return false; // file carries no deletes
    }
    long key = ((long) ord << 40) | pos;
    int i = Arrays.binarySearch(runStarts, key);
    if (i < 0) {
      i = -i - 2; // rightmost start < key
      if (i < 0) {
        return false;
      }
    }
    return key <= runEnds[i];
  }

  /** One py4j round trip builds the whole long[] from a CSV string. */
  public static long[] parseCsvLongs(String csv) {
    if (csv.isEmpty()) {
      return new long[0];
    }
    int n = 1;
    for (int i = 0; i < csv.length(); i++) {
      if (csv.charAt(i) == ',') {
        n++;
      }
    }
    long[] out = new long[n];
    int idx = 0;
    int start = 0;
    for (int i = 0; i <= csv.length(); i++) {
      if (i == csv.length() || csv.charAt(i) == ',') {
        out[idx++] = Long.parseLong(csv, start, i, 10);
        start = i + 1;
      }
    }
    Arrays.sort(out);
    return out;
  }

  /** py4j auto-converts a Python list of str to List in one command. */
  public static UTF8String[] fromStrings(List<String> items) {
    UTF8String[] out = new UTF8String[items.size()];
    for (int i = 0; i < out.length; i++) {
      out[i] = UTF8String.fromString(items.get(i));
    }
    Arrays.sort(out);
    return out;
  }
}
