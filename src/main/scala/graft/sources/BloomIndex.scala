package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-file Bloom-filter index for [[TxnLake]] point-lookup skipping —
  * Delta's bloom-filter index shape: min/max stats prune RANGE predicates,
  * but a high-cardinality column written round-robin (or z-ordered on
  * other dimensions) spans its full range in every file, so an equality
  * lookup keeps everything. A small per-(file, column) bloom sidecar
  * answers "definitely absent" for exactly that case: a point query on a
  * 100 TB table opens the one file that can contain the key (plus the
  * false-positive tail) instead of all of them.
  *
  * Determinism: bits come from md5(value-as-Spark-string) double-hashed
  * into k=6 positions — no RNG, no per-run salt — so layouts and specs
  * reproduce bit-for-bit. Sidecars (`<data-file>.bloom.<col>`) live in the
  * immutable data dir beside their file: they publish atomically with the
  * commit that names the file, vacuum reclaims them with the dir, and the
  * log entry only carries a one-bit per-column marker (never the bits).
  */
object BloomIndex {

  /** 2^17 bits = 16 KiB per (file, column): ~1% false positives at ~13k
    * distinct keys per file, degrading gracefully above. */
  val DefaultBits: Int = 1 << 17

  private val K = 6

  def empty(nBits: Int = DefaultBits): Array[Long] = new Array[Long](nBits / 64)

  // one digest instance per thread, reset by digest() itself — the
  // getInstance factory per value dominated the sidecar build on
  // gram-sized indexes (millions of adds per commit)
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hashes(value: String): (Long, Long) = {
    val d = md.get().digest(value.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong(0), bb.getLong(8))
  }

  def add(bits: Array[Long], value: String): Unit = {
    val m = bits.length * 64
    val (h1, h2) = hashes(value)
    var i = 0
    while (i < K) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "BloomIndex: size mismatch")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) | b(i); i += 1 }
    out
  }

  def mightContain(bits: Array[Long], value: String): Boolean = {
    val m = bits.length * 64
    val (h1, h2) = hashes(value)
    var i = 0
    while (i < K) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Sidecar path for a data file's per-column bloom. */
  def sidecar(dataFile: Path, col: String): Path =
    new Path(dataFile.getParent, s"${dataFile.getName}.bloom.$col")

  def write(f: FileSystem, dataFile: Path, col: String,
            bits: Array[Long]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    val out = f.create(sidecar(dataFile, col), false)
    try out.write(bb.array()) finally out.close()
  }

  /** Load a sidecar; None when absent (reader older/newer than writer →
    * pruning stays conservative). */
  def read(f: FileSystem, dataFile: Path, col: String): Option[Array[Long]] = {
    val p = sidecar(dataFile, col)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try {
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Some(Array.fill(bytes.length / 8)(bb.getLong))
    } finally in.close()
  }
}
