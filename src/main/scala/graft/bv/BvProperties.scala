package graft.bv

/** Per-stream universal-code selection, mirroring upstream BVGraph's coding
  * constants and `compressionflags` 4-bit fields
  * (/root/reference/.../patched/HdfsBVGraph.java:307-340). Upstream values:
  * GAMMA=1 DELTA=2 GOLOMB=3 SKEWED_GOLOMB=4 ARITH=5 INTERP=6 UNARY=7 ZETA=8
  * NIBBLE=9. GAMMA/DELTA/UNARY/ZETA/NIBBLE/GOLOMB/SKEWED_GOLOMB decode and
  * encode end-to-end here. The Golomb family needs a modulus; we carry it
  * in the `.properties` sidecar as `golombmodulus` — a codec parameter
  * exactly like `zetak`. NOTE this key is a graft-only EXTENSION: the
  * reference parses the flag names via reflection
  * (patched/HdfsBVGraph.java:325-340) but inherits upstream BVGraph's read
  * dispatch, which has no modulus source and THROWS on Golomb-coded
  * streams — the reference cannot read such graphs at all, so
  * graft-written Golomb graphs interoperate only with graft. A
  * Golomb-flagged sidecar WITHOUT the key is rejected at parse time
  * (decoding with a guessed default would silently produce garbage).
  * ARITH/INTERP are parse-accepted upstream but undecodable; we reject
  * them with a clear error at flag-parse time.
  */
object Coding {
  val GAMMA = 1
  val DELTA = 2
  val GOLOMB = 3
  val SKEWED_GOLOMB = 4
  val UNARY = 7
  val ZETA = 8
  val NIBBLE = 9

  def name(c: Int): String = c match {
    case GAMMA => "GAMMA"
    case DELTA => "DELTA"
    case GOLOMB => "GOLOMB"
    case SKEWED_GOLOMB => "SKEWED_GOLOMB"
    case UNARY => "UNARY"
    case ZETA => "ZETA"
    case NIBBLE => "NIBBLE"
    case other => s"UNSUPPORTED($other)"
  }

  def byName(s: String): Int = s match {
    case "GAMMA" => GAMMA
    case "DELTA" => DELTA
    case "UNARY" => UNARY
    case "ZETA" => ZETA
    case "NIBBLE" => NIBBLE
    case "GOLOMB" => GOLOMB
    case "SKEWED_GOLOMB" => SKEWED_GOLOMB
    case other => throw new IllegalArgumentException(
      s"Compression flag coding $other unsupported")
  }
}

/** Codings for the six BV streams; defaults match upstream
  * (outdegrees γ, blocks γ, residuals ζ, references unary, block counts γ,
  * offsets γ).
  */
final case class StreamCodings(
    outdegree: Int = Coding.GAMMA,
    block: Int = Coding.GAMMA,
    residual: Int = Coding.ZETA,
    reference: Int = Coding.UNARY,
    blockCount: Int = Coding.GAMMA,
    offset: Int = Coding.GAMMA) {

  /** `|`-separated flag string; empty means all-defaults (what upstream
    * writes for default-coded graphs). */
  def toFlagString: String = {
    val d = StreamCodings()
    val parts = Seq(
      (outdegree, d.outdegree, "OUTDEGREES"),
      (block, d.block, "BLOCKS"),
      (residual, d.residual, "RESIDUALS"),
      (reference, d.reference, "REFERENCES"),
      (blockCount, d.blockCount, "BLOCK_COUNT"),
      (offset, d.offset, "OFFSETS")).collect {
      case (c, dflt, prefix) if c != dflt => s"${prefix}_${Coding.name(c)}"
    }
    parts.mkString("|")
  }

  /** True when any stream uses a Golomb-family coding (these need the
    * `golombmodulus` sidecar key to be decodable). */
  def usesGolomb: Boolean =
    Seq(outdegree, block, residual, reference, blockCount, offset)
      .exists(c => c == Coding.GOLOMB || c == Coding.SKEWED_GOLOMB)
}

object StreamCodings {
  /** Parse a `compressionflags` value (e.g. "OUTDEGREES_GAMMA|RESIDUALS_ZETA").
    * Unknown stream prefixes are an error, matching upstream's reflection
    * failure (/root/reference/.../patched/HdfsBVGraph.java:334-336).
    */
  def fromFlagString(s: String): StreamCodings = {
    var c = StreamCodings()
    if (s == null || s.trim.isEmpty) return c
    // Coding names sorted longest-first so multi-word names split off the
    // right suffix: RESIDUALS_SKEWED_GOLOMB must parse as stream RESIDUALS
    // + coding SKEWED_GOLOMB, not as the bogus stream "RESIDUALS_SKEWED"
    // (a lastIndexOf('_') cut would).
    val codingNames = Seq("SKEWED_GOLOMB", "GOLOMB", "GAMMA", "DELTA",
      "UNARY", "ZETA", "NIBBLE")
    s.split("\\|").map(_.trim).filter(_.nonEmpty).foreach { flag =>
      val cut = codingNames.find(n => flag.endsWith("_" + n))
        .map(n => flag.length - n.length - 1)
        .getOrElse(flag.lastIndexOf('_'))
      if (cut <= 0) throw new IllegalArgumentException(
        s"Compression flag $flag unknown.")
      val (stream, coding) = (flag.substring(0, cut), Coding.byName(flag.substring(cut + 1)))
      stream match {
        case "OUTDEGREES" => c = c.copy(outdegree = coding)
        case "BLOCKS" => c = c.copy(block = coding)
        case "RESIDUALS" => c = c.copy(residual = coding)
        case "REFERENCES" => c = c.copy(reference = coding)
        case "BLOCK_COUNT" => c = c.copy(blockCount = coding)
        case "OFFSETS" => c = c.copy(offset = coding)
        case other => throw new IllegalArgumentException(
          s"Compression flag $flag unknown.")
      }
    }
    c
  }
}

/** The `.properties` sidecar (SURVEY.md §1.2). */
final case class BvProperties(
    nodes: Int,
    arcs: Long,
    windowSize: Int = 7,
    maxRefCount: Int = 3,
    minIntervalLength: Int = 4,
    zetaK: Int = 3,
    codings: StreamCodings = StreamCodings(),
    version: Int = 0,
    graphClass: String = "it.unimi.dsi.webgraph.BVGraph",
    golombModulus: Int = BvProperties.DEFAULT_GOLOMB_MODULUS,
    firstNode: Long = 0L) {

  private def usesGolomb: Boolean = codings.usesGolomb

  def render: String = {
    val sb = new StringBuilder
    sb.append("#BVGraph properties\n")
    sb.append(s"graphclass=$graphClass\n")
    sb.append(s"version=$version\n")
    sb.append(s"nodes=$nodes\n")
    sb.append(s"arcs=$arcs\n")
    sb.append(s"windowsize=$windowSize\n")
    sb.append(s"maxrefcount=$maxRefCount\n")
    sb.append(s"minintervallength=$minIntervalLength\n")
    sb.append(s"zetak=$zetaK\n")
    // Golomb-family streams need a modulus; it travels in the sidecar like
    // `zetak` does (emitted only when used, so default-coded graphs render
    // byte-identically to upstream's). Pick ≈ ln(2) · mean-gap — the
    // optimal Golomb modulus for geometric gaps (Golomb 1966;
    // Witten–Moffat–Bell, "Managing Gigabytes" §3.3).
    if (usesGolomb) sb.append(s"golombmodulus=$golombModulus\n")
    // Shard graphs (graft extension): `firstnode` anchors the value-coded
    // deltas (first interval left / first residual) at the shard's GLOBAL
    // base id instead of the local index. Without it every node in shard k
    // pays ≈ zigzag(base_k) bits for its first residual — invisible noise
    // under γ/ζ (log-cost), catastrophic under Golomb (unary quotient:
    // measured 108 vs 16 bits/link at a 2M-node / 32-shard rehearsal).
    // Emitted only when non-zero, so unsharded graphs stay byte-identical
    // to upstream BVGraph output.
    if (firstNode != 0L) sb.append(s"firstnode=$firstNode\n")
    sb.append(s"compressionflags=${codings.toFlagString}\n")
    sb.toString
  }
}

object BvProperties {
  val BVGRAPH_VERSION = 0

  /** Construction-time default modulus (≈ ln 2 · mean-gap is optimal for
    * geometric gaps; 8 is a sane mid-range start). Used only when BUILDING
    * a BvProperties in code — a parsed Golomb-flagged sidecar must carry
    * `golombmodulus` explicitly or parsing fails (decoding with a guessed
    * modulus yields garbage, so fail fast beats a silent default). */
  val DEFAULT_GOLOMB_MODULUS = 8

  def parse(text: String): BvProperties = {
    val props = new java.util.Properties()
    props.load(new java.io.StringReader(text))
    def get(k: String): String = {
      val v = props.getProperty(k)
      if (v == null) throw new IllegalArgumentException(s"Missing property $k")
      v
    }
    val graphClass = get("graphclass")
      .replace("it.unimi.dsi.big.webgraph", "it.unimi.dsi.webgraph")
    if (!graphClass.endsWith("BVGraph"))
      throw new IllegalArgumentException(s"Cannot load graph class $graphClass")
    val version = get("version").toInt
    if (version > BVGRAPH_VERSION)
      throw new IllegalArgumentException(s"Unsupported format version $version")
    val nodes = get("nodes").toLong
    if (nodes > Int.MaxValue)
      throw new IllegalArgumentException(
        s"Cannot handle graphs with $nodes (>2^31) nodes")
    val codings = StreamCodings.fromFlagString(props.getProperty("compressionflags"))
    val golombModulus = Option(props.getProperty("golombmodulus")).map(_.toInt)
      .getOrElse {
        if (codings.usesGolomb) throw new IllegalArgumentException(
          "Golomb-family compressionflags require an explicit golombmodulus " +
            "property (a graft extension — upstream BVGraph cannot decode " +
            "Golomb streams); refusing to guess a modulus")
        DEFAULT_GOLOMB_MODULUS
      }
    BvProperties(
      nodes = nodes.toInt,
      arcs = get("arcs").toLong,
      windowSize = get("windowsize").toInt,
      maxRefCount = get("maxrefcount").toInt,
      minIntervalLength = get("minintervallength").toInt,
      zetaK = Option(props.getProperty("zetak")).map(_.toInt).getOrElse(3),
      codings = codings,
      version = version,
      graphClass = graphClass,
      golombModulus = golombModulus,
      firstNode = Option(props.getProperty("firstnode")).map(_.toLong)
        .getOrElse(0L))
  }
}
