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
