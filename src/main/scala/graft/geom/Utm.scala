package graft.geom

/** UTM (Transverse Mercator) ↔ WGS84 conversion — the deterministic
  * coordinate map behind the reference's reproject() (base.py:201-236; its
  * cadastre layers are EPSG:326xx / 258xx). Krüger series to n³ (Karney
  * 2011 coefficients), sub-mm over a UTM zone — public geodesy.
  */
object Utm {
  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val k0 = 0.9996
  private val E0 = 500000.0
  private val n = f / (2 - f)
  private val n2 = n * n
  private val n3 = n2 * n
  private val A = a / (1 + n) * (1 + n2 / 4 + n2 * n2 / 64)
  private val e = math.sqrt(f * (2 - f))
  private val alpha = Array(
    n / 2 - 2 * n2 / 3 + 5 * n3 / 16,
    13 * n2 / 48 - 3 * n3 / 5,
    61 * n3 / 240)
  private val beta = Array(
    n / 2 - 2 * n2 / 3 + 37 * n3 / 96,
    n2 / 48 + n3 / 15,
    17 * n3 / 480)
  private val delta = Array(
    2 * n - 2 * n2 / 3 - 2 * n3,
    7 * n2 / 3 - 8 * n3 / 5,
    56 * n3 / 15)

  /** (easting, northing) in `zone` (northern hemisphere) -> (lon, lat) degrees. */
  def utmToWgs84(zone: Int, x: Double, y: Double): (Double, Double) = {
    val xi = y / (k0 * A)
    val eta = (x - E0) / (k0 * A)
    var xiP = xi
    var etaP = eta
    for (i <- 1 to 3) {
      xiP -= beta(i - 1) * math.sin(2 * i * xi) * math.cosh(2 * i * eta)
      etaP -= beta(i - 1) * math.cos(2 * i * xi) * math.sinh(2 * i * eta)
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    for (i <- 1 to 3) phi += delta(i - 1) * math.sin(2 * i * chi)
    val lam0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val lam = lam0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** (lon, lat) degrees -> (easting, northing) in `zone`. */
  def wgs84ToUtm(zone: Int, lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val lamD = math.toRadians(lon) - lam0
    val sp = math.sin(phi)
    val t = math.sinh(atanh(sp) - e * atanh(e * sp))
    val xiP = math.atan2(t, math.cos(lamD))
    val etaP = atanh(math.sin(lamD) / math.sqrt(1 + t * t))
    var xi = xiP
    var eta = etaP
    for (i <- 1 to 3) {
      xi += alpha(i - 1) * math.sin(2 * i * xiP) * math.cosh(2 * i * etaP)
      eta += alpha(i - 1) * math.cos(2 * i * xiP) * math.sinh(2 * i * etaP)
    }
    (k0 * A * eta + E0, k0 * A * xi)
  }

  private def atanh(v: Double): Double = 0.5 * math.log((1 + v) / (1 - v))

  /** Reproject a multipolygon UTM -> WGS84 (pure per-vertex map — exactly
    * the "deterministic coordinate map" SURVEY §1.4 prescribes). */
  def reproject(mp: Geom.MultiPolygon, zone: Int): Geom.MultiPolygon =
    mp.map(_.map(_.map { p =>
      val (lon, lat) = utmToWgs84(zone, p.x, p.y)
      Pt(lon, lat)
    }))
}
