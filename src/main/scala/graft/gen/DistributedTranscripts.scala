package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Turn

/** Distributed deterministic transcript generator for scale benchmarks:
  * the same pure (seed, conv, i) function as [[SynthTranscripts]], fanned
  * out with `spark.range` so generation itself scales with the cluster —
  * no driver-side materialization, no shuffle (narrow flatMap over range
  * splits).
  */
object DistributedTranscripts {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** conv c gets baseTurns turns, hot convs (every `hotEvery`-th)
    * `hotFactor`× — the zipf-ish skew that exercises salting/AQE paths at
    * scale. Crank hotFactor up (e.g. 5000) for single-mega-conversation
    * skew benchmarks.
    */
  def turns(spark: SparkSession, nConvs: Long, baseTurns: Int,
            seed: Long = 42L, hotEvery: Int = 97, hotFactor: Int = 16)
      : Dataset[Turn] = {
    import spark.implicits._
    val t0 = 1704067200000L
    spark.range(0L, nConvs).flatMap { c =>
      val hot = if (c % hotEvery == 0) baseTurns * hotFactor else baseTurns
      val conv = s"conv$c"
      var ts = t0 + (mix(seed ^ c) % (30L * 86400000L)).abs
      (0 until hot).iterator.map { i =>
        val r = mix(seed ^ (c << 20) ^ i)
        val gapMs = if (i > 0 && i % 13 == 0) 1900000L + (r % 600000L).abs
                    else 2000L + (r % 40000L).abs
        ts += gapMs
        Turn(conv, i,
             if (i % 2 == 0) "user" else "assistant",
             s"t-$conv-$i-${(r & 0xffffffffL).toHexString}",
             if (r % 5 == 0) Some(if (r % 2 == 0) "search" else "code") else None,
             new Timestamp(ts))
      }
    }
  }
}
