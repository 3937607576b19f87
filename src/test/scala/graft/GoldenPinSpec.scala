package graft

import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.Row

import graft.queries.Registry

/** Golden-output pins for the queries that have NO DuckDB oracle
  * (approx sketches, LSH/ANN paths, signature dumps): their quality
  * is gated by error-bound/recall specs (RelationalSpec, MinHashSpec,
  * SimHashSpec, SimilaritySpec, SketchSpec, MediaSpec), but a recall
  * bound alone would let the OUTPUT drift silently between rounds —
  * e.g. a seed change reshuffling every LSH bucket while recall stays
  * ≥0.9. Each pin is a sha256 over the canonicalized sf0.01 result
  * (schema line + rows rendered with 6-significant-digit floats,
  * sorted), so any behavioral change shows up as a failed pin that
  * the author must consciously re-record.
  *
  * Pins are environment-deterministic: every pinned query either
  * orders its output or is order-insensitive after the row sort here;
  * floats are rounded to absorb sub-ulp reassociation, and the suite
  * runs in the same fixed session config as the rest of the specs.
  *
  * To re-record after an INTENTIONAL behavior change:
  *   SPARK_GRAFT_REGEN_PINS=1 sbt "testOnly graft.GoldenPinSpec"
  * and paste the printed map back into `expected`.
  */
class GoldenPinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def render(v: Any): String = v match {
    case null => "∅"
    case d: Double =>
      if (d.isNaN) "NaN"
      else {
        val z = if (d == 0.0) 0.0 else d // collapse -0.0
        String.format(Locale.ROOT, "%.6e", Double.box(z))
      }
    case f: Float => render(f.toDouble)
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case a: scala.collection.Seq[_] => a.map(render).mkString("[", ",", "]")
    case a: Array[_] => a.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, w) => render(k) + "->" + render(w) }
        .sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(render).mkString("(", ",", ")")
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: BigDecimal => d.underlying.stripTrailingZeros.toPlainString
    case t: java.sql.Timestamp => t.toInstant.toString
    case other => other.toString
  }

  private def pin(name: String): String = {
    val df = Registry.queries(name)(spark, dir)
    val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    val rows = df.collect().map(r => render(r)).sorted
    val digest = MessageDigest.getInstance("SHA-256")
    digest.update(schema.getBytes("UTF-8"))
    rows.foreach { r => digest.update('\n'.toByte); digest.update(r.getBytes("UTF-8")) }
    val hash = digest.digest().map(b => f"$b%02x").mkString
    spark.catalog.clearCache() // queries may persist intermediates
    hash
  }

  /** sha256(canonical sf0.01 output) per pinned query. Every
    * no-oracle query MUST appear (the test above); queries converted
    * to full oracles (q55/q56/q63/q64/q68/q69, and q72/q102/q115/
    * q116 since round 16) KEEP their pins as cheap cross-round drift
    * insurance — the oracle catches divergence from DuckDB, the pin
    * catches both engines moving together (e.g. a parameter change).
    * q72/q115/q116 kept their pre-conversion hashes verbatim: at
    * sf0.01 the production K values hold these sketches in exact
    * mode, where the portable registers reproduce the DataSketches
    * outputs bit-for-bit.
    */
  private val expected = Map(
    "q19_approx_distinct" -> "d30e6a125b01731a6ae19cfdace8b3e1bd026b2bff667ddc70f524535ed659e6",
    "q29_approx_percentiles" -> "58c51a5462576cfe9d5e68667970d555dc4b32f0fcfabd9f95407ffb322f025b",
    "q55_minhash_signatures" -> "c04e430a6abb6166e505888d15dc10747fc48385936489f1ab98992f84ddabcd",
    "q56_lsh_near_dup" -> "5e6edd0a14bdb5a31736eec45ac4ed4d1d89e0787c186a528cb9493bbb284b05",
    "q57_simhash" -> "8dfc1da2fc6d0d40eb35d627fa584ae863b5ec51c64ceb918ffe004b80a9537a",
    "q58_fingerprint" -> "105f14e2aeebcaaf70f04aa56cb66d9557dfb516afaca9b96f23549ed44aec78",
    "q63_ann_lsh" -> "c4e690adf76f7b523f166b4bd0456273c38726100bc78b6b1010bd142e15df25",
    "q64_ann_ivf" -> "0f657231731ca79e08c494ddf5aaeb069861ba43d7345eed437ed22eca2d17c7",
    "q68_simhash_neardup" -> "15dabf51c0a1dd07d2cdb5160b91c3eae93d04a42849da8c75db79a0c1011ad1",
    "q69_embedding_neardup_lsh" -> "300f038752a3825c9c01833340d9f957a3b4d68518cbbf771233257b1276d7ac",
    "q71_media_features" -> "7214c0c0d0886d63b1a4514d34f27de82915ed77bf22e071026943f740196e83",
    "q72_token_cms" -> "d3722a7ee4d9214d965c456c93bd93c68978d56d841dbd03da2f2009e0bfc3c1",
    "q92_semantic_dedup" -> "01a1a6a8d697786f1646c9cc0cf3b23b50dda50f488f271ab777378f4bbe8c74",
    "q102_hll_rollup" -> "8e59231691f45f639c8b865920188129a91daea312d631cc23865e4695eab876",
    "q115_theta_source_overlap" -> "3a4654e2e3fdf8d92961d1da95b2029a75cd898df7cc119419af99b8eaaaa989",
    "q116_theta_novelty" -> "7f94db1c39ad30a462bbea16f80f8a3cbcb164f60d8ec562f7db4adc107bb4a2")

  private val regen = sys.env.get("SPARK_GRAFT_REGEN_PINS").contains("1")

  test("every declared no-oracle query is golden-pinned") {
    // a no-oracle query without a pin gets only the driver's weak
    // rows-only check — exactly the drift window this suite exists
    // to close (q115/q116 initially shipped unpinned this way)
    val noOracle = Registry.all.filter(_.sql.isEmpty).map(_.name).toSet
    val unpinned = noOracle -- expected.keySet
    assert(unpinned.isEmpty, s"no-oracle queries without a pin: $unpinned")
  }

  test("no-oracle query outputs match their committed golden pins") {
    val got = expected.keys.toSeq.sorted.map(n => n -> pin(n))
    if (regen) {
      println("---- golden pins (paste into GoldenPinSpec.expected) ----")
      got.foreach { case (n, h) => println(s"""    "$n" -> "$h",""") }
    } else {
      val bad = got.filter { case (n, h) => expected(n) != h }
      assert(bad.isEmpty,
        s"golden pin drift (re-record ONLY for intentional changes): " +
          bad.map { case (n, h) => s"$n=$h (pinned ${expected(n)})" }.mkString("; "))
    }
  }
}
