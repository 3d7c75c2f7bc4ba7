package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Turn

/** Pure seeded transcript generator for unit tests and streaming fixtures
  * (FIXTURES.md §1) — no external data, fully deterministic in (seed, i).
  *
  * Conversation sizes are zipf-ish skewed (a few hot conversations) to
  * exercise salting / skew paths; inter-turn gaps occasionally exceed the
  * session threshold so session segmentation has work to do.
  */
object SynthTranscripts {

  private def mix(z0: Long): Long = { // splitmix64 — deterministic, public domain
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** n conversations; conv k has `base + (hot skew)` turns. */
  def turnRows(nConvs: Int, baseTurns: Int, seed: Long = 42L): Seq[Turn] = {
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    (0 until nConvs).flatMap { c =>
      val hot = if (c % 17 == 0) baseTurns * 8 else baseTurns
      val conv = s"conv$c"
      var ts = t0 + (mix(seed ^ c) % 86400000L).abs
      (0 until hot).map { i =>
        val r = mix(seed ^ (c.toLong << 20) ^ i)
        // mostly short gaps; every ~11th turn a >30min session gap
        val gapMs = if (i > 0 && i % 11 == 0) 1900000L + (r % 600000L).abs
                    else 5000L + (r % 55000L).abs
        ts += gapMs
        val role = if (i % 2 == 0) "user" else "assistant"
        val tool = if (r % 5 == 0) Some(if (r % 2 == 0) "search" else "code") else None
        Turn(conv, i, role, s"t-$conv-$i-${(r & 0xffffff).toHexString}", tool,
             new Timestamp(ts))
      }
    }
  }

  def turns(spark: SparkSession, nConvs: Int, baseTurns: Int,
            seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.createDataset(turnRows(nConvs, baseTurns, seed))
  }
}
