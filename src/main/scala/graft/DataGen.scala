package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Deterministic, distributed synthetic-corpus generator for the scaling
  * study (SCALING.md). Reproduces the TESTDATA.md star schema — same
  * table names, column names/types, categorical domains, and row-count
  * ratios (rows = base(table) x sf) — at scale factors the read-only
  * driver corpus does not ship (sf0.3, sf1, sf3, ...), so time-vs-rows
  * exponents can be fitted over a distributionally consistent series.
  *
  * Determinism contract: every row is a pure function of (table, sf,
  * row id) — each row seeds its own `java.util.Random` from a mixed
  * 64-bit hash of those, so generation is embarrassingly parallel
  * (`spark.range(n).mapPartitions`), identical under re-runs, retries,
  * and any partitioning, and needs no driver-side RNG state. This is
  * the 100 TB generator idiom: no sequential seed chain, no collect.
  *
  * Distribution fidelity (measured against the driver corpus at
  * sf0.01/0.1, see SCALING.md §"generator realism"):
  *  - documents: 31-word vocab, 8-105 words/doc (avg n_chars ~297),
  *    lang mix en 40% / zh,es,fr,de 15% each, 20 uniform sources,
  *    ~4.5% planted near-duplicate tails + ~0.16% exact duplicates
  *    (sf0.1 driver corpus: 8 exact dups / 228 shared-prefix pairs).
  *  - embeddings: 64-dim unit-norm gaussians around 10 label centroids
  *    with own-centroid cosine ~0.07 (matches driver corpus 0.0707),
  *    no cos>0.95 near-dup pairs (driver corpus has none either).
  *  - events: 30-day span, ~id-ordered timestamps with jitter,
  *    15000 x sf users, 5 uniform event types, Exp(35) values.
  *  - lineitem/orders: 1-7 lines per order (avg ~4), TPC-H-ish value
  *    ranges (qty 1-50, extprice = qty x unit(900-2100), 6 uniform
  *    returnflag x linestatus cells, 1995-2001 date span).
  */
object DataGen {
  /** Rows per table at sf=1 — 10x the driver corpus's sf0.1 counts. */
  val BaseRows: Map[String, Long] = Map(
    "region" -> 5L, "nation" -> 25L, "supplier" -> 10000L,
    "customer" -> 150000L, "part" -> 200000L, "orders" -> 1500000L,
    "lineitem" -> 6000000L, "events" -> 1000000L,
    "documents" -> 50000L, "embeddings" -> 20000L)

  /** documents/embeddings carry the driver corpus's 500-row floor
    * (sf0.001 and sf0.01 both ship 500 of each). */
  def rowsFor(table: String, sf: Double): Long = {
    val n = math.max(1L, math.round(BaseRows(table) * sf))
    if (table == "documents" || table == "embeddings") math.max(500L, n) else n
  }

  /** splitmix64-style finalizer: one RNG per (table, id), no state. */
  private def mix(salt: Long, id: Long): Long = {
    var h = id * 0x9E3779B97F4A7C15L + salt * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L; h ^ (h >>> 33)
  }
  private def rng(salt: Long, id: Long) = new java.util.Random(mix(salt, id))

  private def r2(x: Double): Double = math.round(x * 100.0) / 100.0

  // Stable per-table salts (values arbitrary, frozen for determinism).
  private val SUPP = 1L; private val CUST = 2L; private val PART = 3L
  private val ORD = 4L; private val LINE = 5L; private val EVT = 6L
  private val DOC = 7L; private val EMB = 8L

  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PTypes = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val Adjs = Array("small", "red", "blue", "green", "large", "dark", "light", "shiny")
  private val Nouns = Array("ring", "widget", "bolt", "gear", "cog", "pin", "valve", "disk")
  private val EventTypes = Array("click", "view", "signup", "error", "purchase")
  private val Langs = Array("en", "zh", "es", "fr", "de") // en 40%, rest 15% each
  private val Vocab: Array[String] = Array(
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "a", "spark", "part",
    "group", "big", "sort", "query", "fast", "the")

  private val EpochDay = 86400L * 1000000L // micros
  private val OrdersEpochStart = // 1995-01-01 UTC, micros
    java.time.LocalDate.of(1995, 1, 1).toEpochDay * EpochDay
  private val EventsStart =
    java.time.LocalDate.of(2024, 1, 1).toEpochDay * EpochDay
  private val EventsSpan = 30L * EpochDay

  private def ts(micros: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))

  // ---- per-table row builders (pure functions of (sf, id)) ----

  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp, o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def supplierRow(id: Long): Supplier = {
    val r = rng(SUPP, id)
    Supplier(id, f"Supplier#$id%09d", r.nextInt(25), r2(-1000.0 + r.nextDouble() * 11000.0))
  }
  def customerRow(id: Long): Customer = {
    val r = rng(CUST, id)
    Customer(id, f"Customer#$id%09d", r.nextInt(25),
      r2(-1000.0 + r.nextDouble() * 11000.0), Segments(r.nextInt(5)))
  }
  def partRow(id: Long): Part = {
    val r = rng(PART, id)
    Part(id, s"${Adjs(r.nextInt(Adjs.length))} ${Nouns(r.nextInt(Nouns.length))}",
      s"Brand#${1 + r.nextInt(25)}", PTypes(r.nextInt(6)), 1 + r.nextInt(50),
      900.0 + r.nextInt(1000) / 10.0)
  }
  def orderRow(id: Long, sf: Double): Order = {
    val r = rng(ORD, id)
    val nCust = rowsFor("customer", sf)
    val dateMicros = OrdersEpochStart + r.nextInt(2404).toLong * EpochDay
    // status correlates with age, TPC-H-style: old F, recent O, rare P
    val frac = (dateMicros - OrdersEpochStart).toDouble / (2404.0 * EpochDay)
    val status = if (r.nextDouble() < 0.04) "P" else if (frac < 0.5) "F" else "O"
    Order(id, (r.nextDouble() * nCust).toLong, status,
      r2(850.0 + math.pow(r.nextDouble(), 2.0) * 520000.0),
      ts(dateMicros), Priorities(r.nextInt(5)))
  }
  /** Lines per order: 1-7, avg ~4 (driver corpus: 4.07). */
  def linesPerOrder(orderKey: Long): Int = 1 + (mix(LINE + 77, orderKey) >>> 33).toInt % 7
  def lineitemRow(orderKey: Long, lineNo: Int, sf: Double): Lineitem = {
    val r = rng(LINE, orderKey * 8 + lineNo)
    val ord = orderRow(orderKey, sf)
    val qty = (1 + r.nextInt(50)).toDouble
    Lineitem(orderKey, (r.nextDouble() * rowsFor("part", sf)).toLong,
      (r.nextDouble() * rowsFor("supplier", sf)).toLong, lineNo, qty,
      r2(qty * (900.0 + r.nextDouble() * 1200.0)), r.nextInt(11) / 100.0,
      r.nextInt(9) / 100.0, "ANR".charAt(r.nextInt(3)).toString,
      "FO".charAt(r.nextInt(2)).toString,
      ts(ord.o_orderdate.getTime * 1000 + (1 + r.nextInt(95)).toLong * EpochDay))
  }
  def eventRow(id: Long, sf: Double): Event = {
    val r = rng(EVT, id)
    val n = rowsFor("events", sf)
    val base = EventsStart + (BigInt(id) * EventsSpan / n).toLong
    val jitter = (r.nextDouble() * 2.0 - 1.0) * (EventsSpan / n)
    val value = math.min(500.0, math.max(0.01, -35.0 * math.log1p(-r.nextDouble())))
    Event(id, ts(base + jitter.toLong), (r.nextDouble() * (15000.0 * sf).max(1.0)).toLong,
      EventTypes(r.nextInt(5)), r2(value), s"""{"k": ${r.nextInt(100)}}""")
  }

  /** Base word stream for a doc id (before dup planting). */
  private def docWords(id: Long): Array[String] = {
    val r = rng(DOC, id)
    val n = 8 + r.nextInt(98)
    Array.fill(n)(Vocab(r.nextInt(Vocab.length)))
  }
  def documentRow(id: Long, sf: Double): Document = {
    val r = rng(DOC + 13, id)
    val u = r.nextDouble()
    // near-dup: copy an earlier doc's words, rewrite ~12% of the tail;
    // exact dup: verbatim copy. Rates match the driver corpus (sf0.1:
    // 8/5000 exact, 228/5000 shared-60-char-prefix pairs).
    val words: Array[String] =
      if (id >= 25 && u < 0.0016) docWords(id - 1 - r.nextInt(24))
      else if (id >= 25 && u < 0.047) {
        val base = docWords(id - 1 - r.nextInt(24)).clone()
        val from = math.max(12, (base.length * 0.7).toInt)
        var i = from
        while (i < base.length) {
          if (r.nextDouble() < 0.4) base(i) = Vocab(r.nextInt(Vocab.length))
          i += 1
        }
        base
      } else docWords(id)
    val lu = r.nextDouble()
    val lang = if (lu < 0.40) "en" else Langs(1 + ((lu - 0.40) / 0.15).toInt.min(3))
    val text = words.mkString(" ")
    Document(id, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
  }

  /** Pure unit gaussians with uniform random labels. The driver
    * corpus's apparent "cluster cohesion" (own-label-centroid cosine
    * 0.0707 at 200 points/label) is exactly sqrt(d/m)/sqrt(d) =
    * sqrt(64/200)/8 — the self-noise of estimating a centroid from
    * the points themselves — so the real corpus has NO planted
    * cluster signal and neither does this one. */
  def embeddingRow(id: Long): Embedding = {
    val r = rng(EMB, id)
    val label = r.nextInt(10)
    val v = Array.fill(64)(r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    Embedding(id, v.map(x => (x / n).toFloat), label)
  }

  // ---- table DataFrames ----

  def table(spark: SparkSession, name: String, sf: Double): DataFrame = {
    import spark.implicits._
    val n = rowsFor(name, sf)
    name match {
      case "region" =>
        Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
          .zipWithIndex.map { case (nm, i) => Region(i, nm) }.toSeq.toDF()
      case "nation" =>
        (0 until 25).map(i => Nation(i, s"NATION_$i", i % 5)).toDF()
      case "supplier" => spark.range(n).map(id => supplierRow(id)).toDF()
      case "customer" => spark.range(n).map(id => customerRow(id)).toDF()
      case "part" => spark.range(n).map(id => partRow(id)).toDF()
      case "orders" => spark.range(n).map(id => orderRow(id, sf)).toDF()
      case "lineitem" =>
        // orders x up-to-7 flatMap keeps generation distributed; the
        // per-order line count derives from the order key alone
        spark.range(rowsFor("orders", sf)).flatMap { ok =>
          (1 to linesPerOrder(ok)).map(ln => lineitemRow(ok, ln, sf))
        }.toDF()
      case "events" => spark.range(n).map(id => eventRow(id, sf)).toDF()
      case "documents" => spark.range(n).map(id => documentRow(id, sf)).toDF()
      case "embeddings" => spark.range(n).map(id => embeddingRow(id)).toDF()
      case other => sys.error(s"unknown table: $other")
    }
  }

  /** Int columns that must land as int32 in parquet (driver-corpus
    * schema parity; Scala Int already encodes as IntegerType). */
  def generate(spark: SparkSession, sf: Double, outDir: String,
      tables: Seq[String] = Seq("region", "nation", "supplier", "customer",
        "part", "orders", "lineitem", "events", "documents", "embeddings")): Unit = {
    // driver-corpus parity: µs-precision timestamps (Spark's default
    // here would otherwise write ns, which the nanosAsLong read path
    // then surfaces as Long — a different loader branch than shipped)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    tables.foreach { t =>
      val df = table(spark, t, sf)
      // single file per table mirrors the driver corpus layout (row
      // groups keep the scan splittable; ~170 MB/file at sf1 max)
      val out = df.coalesce(math.max(1, (rowsFor(t, sf) / 4000000L).toInt))
      out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
  }

  /** args: <sf> <outDir> [table,table,...] */
  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val outDir = args(1)
    val spark = GraftSession.create()
    val tables = if (args.length > 2) args(2).split(",").toSeq
      else Seq("region", "nation", "supplier", "customer", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
    val t0 = System.nanoTime()
    generate(spark, sf, outDir, tables)
    println(f"[datagen] sf=$sf -> $outDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
