package graft.layers

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.Pt
import graft.geom.Geom.MultiPolygon
import graft.ops.ParcelOps
import graft.ops.ParcelOps.{ConsF, Parcel}
import graft.pipeline.AppRun.{MunAddr, MunSeqCons}

/** Deterministic multi-municipality cadastre synthesized from the events
  * table — the closed-form end-to-end input for AppRun.runMulti's oracle
  * (q_apprun_multi).
  *
  * Shape: U = (|events| / 100) * 20 feature ids; municipality m = id % 4
  * ("M0".."M3", coordinate-disjoint by a 100 km y offset); within a mun,
  * k = id / 4 indexes unit-square buildings grouped in clusters of 5
  * (c = k / 5, 500 m apart; slots 5 m apart inside a cluster, so squares
  * never touch). Every chain stage is provably the identity (no parts, no
  * near vertices, areas ≫ MinArea); adjacency merging finds no shared
  * vertices; the parts-count packing merges each 5-cluster into its seed
  * (cluster == cadastral zone via the localId's first 5 chars, distances
  * ≤ 20 < buffer 30, parts sum 5 ≤ 20). Input parcels exist only for even
  * k — create_missing_parcels synthesizes the rest. One non-Entrance
  * address per building survives move_address untouched.
  *
  * Closed form per municipality: out_features = 5t, out_address = 5t,
  * tasks = n_parcels = t, where t = |events| / 100.
  */
object SynthMuni {

  def lid(c: Long, m: Long, k: Long): String = f"$c%05dM${m}K$k%06d"

  /** Wide id flavor: two-digit municipality slot for nMuns up to 99. */
  def lidWide(c: Long, m: Long, k: Long): String = f"$c%05dM$m%02dK$k%06d"

  /** ref → municipality (chars 5..6 of the localId: "M<digit>"). */
  val munOf: String => String = (ref: String) => ref.substring(5, 7)

  /** Wide flavor: "M<2 digits>" at chars 5..7. */
  val munOfWide: String => String = (ref: String) => ref.substring(5, 8)

  /** The ref→mun key function matching [[inputs]]' id scheme for nMuns. */
  def munOfFor(nMuns: Int): String => String =
    if (nMuns <= 9) munOf else munOfWide

  private def square(x0: Double, y0: Double): MultiPolygon =
    Array(Array(Array(Pt(x0, y0), Pt(x0 + 1, y0), Pt(x0 + 1, y0 + 1), Pt(x0, y0 + 1))))

  /** `nMuns` parameterizes the municipality fan-out for weak-scaling
    * sweeps (work ∝ nMuns at constant per-mun size). nMuns <= 9 keeps the
    * single-digit id scheme the q_apprun_multi oracle pins ("M0".."M3");
    * larger fan-outs switch to the two-digit [[lidWide]] flavor — pair
    * with [[munOfFor]]. Defaults reproduce the oracle's 4-mun shape
    * exactly. */
  def inputs(spark: SparkSession, sfDir: String, nMuns: Int = 4)
      : (Dataset[MunSeqCons], Dataset[ParcelOps.MunParcel], Dataset[MunAddr]) = {
    import spark.implicits._
    require(nMuns >= 1 && nMuns <= 99, s"nMuns must be 1..99, got $nMuns")
    val wide = nMuns > 9
    val mkLid: (Long, Long, Long) => String = if (wide) lidWide else lid
    def mLabel(m: Long): String = if (wide) f"M$m%02d" else s"M$m"
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val u = (events.count() / 100L) * 5L * nMuns
    // event_ids are the consecutive 0..N-1, so range(0, u) IS the filtered
    // id column — and it stays correct when u exceeds |events| (large
    // nMuns sweeps), where the filter would silently shrink per-mun work
    // and break the weak-scaling premise
    val ids = spark.range(0, u).as[Long]
    val cons = ids.flatMap { id =>
      val m = id % nMuns; val k = id / nMuns; val c = k / 5; val s = k % 5
      val l = mkLid(c, m, k)
      val ring = square(c * 500.0 + s * 5.0, m * 100000.0)
      val b = MunSeqCons(mLabel(m), 2 * k, ConsF(l, l, "building", 2, 0, ring))
      // every third building carries ONE coincident part: single-level
      // parts merge to the outline (merge_building_parts byLevel.size==1
      // branch) -> parts_to_outline = ceil(K/3) per mun, closed-form
      if (k % 3 == 0)
        Seq(b, MunSeqCons(mLabel(m), 2 * k + 1,
          ConsF(l + "P1", l, "part", 3, 0, ring)))
      else Seq(b)
    }
    val parcels = ids.flatMap { id =>
      val m = id % nMuns; val k = id / nMuns; val c = k / 5; val s = k % 5
      if (k % 2 == 0)
        Some(ParcelOps.MunParcel(mLabel(m), k,
          Parcel(mkLid(c, m, k), null, 0, square(c * 500.0 + s * 5.0, m * 100000.0))))
      else None
    }
    // even k: an Entrance 0.3 m left of the left wall's midpoint — inside
    // AddrThr(10), projection 0.5 from both corners (> EntranceThr 0.4),
    // wall owned by ONE building -> classified 'Entrance' and MOVED onto
    // the wall exactly (the projection arithmetic is exact on a vertical
    // segment). Odd k: a non-Entrance center point, kept untouched.
    val addrs = ids.map { id =>
      val m = id % nMuns; val k = id / nMuns; val c = k / 5; val s = k % 5
      val x0 = c * 500.0 + s * 5.0; val y0 = m * 100000.0
      if (k % 2 == 0)
        MunAddr(mLabel(m), s"A$id", mkLid(c, m, k), "Entrance", x0 - 0.3, y0 + 0.5)
      else
        MunAddr(mLabel(m), s"A$id", mkLid(c, m, k), "Parcel", x0 + 0.5, y0 + 0.5)
    }
    (cons, parcels, addrs)
  }
}
