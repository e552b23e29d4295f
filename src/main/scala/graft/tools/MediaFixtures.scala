package graft.tools

/** Deterministic PNG fixtures for the perceptual-hash dedup family
  * (q231): 72×64 images built from 8×8 uniform blocks, so each block
  * maps 1:1 onto one cell of dHash's 9×8 downsample grid and every
  * fixture's 64-bit hash — and every pairwise Hamming distance — is
  * ANALYTIC ground truth derived from the block functions below, not
  * from running the implementation under test. (PNG is lossless and
  * the luma of (v,v,v) is exactly v, so decode→downsample recovers the
  * block values bit-exactly.)
  *
  * The set encodes the three behaviors a perceptual hash must show:
  *  - `grad_a1` = `grad_a0` + uniform brightness (no clipping): every
  *    left<right comparison is preserved ⇒ Hamming 0 by construction.
  *  - `grad_a2` = `grad_a0` with three single-cell dips, each chosen so
  *    it flips exactly ONE comparison ⇒ Hamming exactly 3.
  *  - `checker_c0` / `stripes_d0`: structurally different images at
  *    Hamming ≥ 32 from everything else — far outside the τ=7 gate.
  *
  * Run once (`runMain graft.tools.MediaFixtures`) and commit the PNGs;
  * the generator stays in-repo so the fixtures are reproducible.
  */
object MediaFixtures {

  val GridW = 9
  val GridH = 8
  val Block = 8 // pixels per grid cell side → 72×64 images

  /** Block-value functions (gray 10–240: headroom for brightness
    * shifts without clipping). Keyed by fixture file name. */
  val grids: Map[String, (Int, Int) => Int] = Map(
    "grad_a0.png" -> ((x, _) => 20 + 20 * x),
    "grad_a1.png" -> ((x, _) => 30 + 20 * x),
    "grad_a2.png" -> { (x, y) =>
      // three single-cell dips; each flips exactly one comparison of a0
      if ((x, y) == ((1, 0)) || (x, y) == ((5, 3)) || (x, y) == ((8, 7))) 15
      else 20 + 20 * x
    },
    "grad_b0.png" -> ((x, _) => 200 - 20 * x),
    "grad_b1.png" -> ((x, _) => 208 - 20 * x),
    "checker_c0.png" -> ((x, y) => if ((x + y) % 2 == 0) 40 else 200),
    "stripes_d0.png" -> ((x, _) => 30 + (x % 3) * 60))

  /** The dHash these blocks produce, derived from the definition alone
    * (bit i = row-major comparison grid[y][x+1] > grid[y][x]). */
  def analyticHash(g: (Int, Int) => Int): Long = {
    var hash = 0L
    var bit = 0
    for (y <- 0 until GridH; x <- 0 until GridW - 1) {
      if (g(x + 1, y) > g(x, y)) hash |= (1L << bit)
      bit += 1
    }
    hash
  }

  def render(g: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      GridW * Block, GridH * Block, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until GridH * Block; x <- 0 until GridW * Block) {
      val v = g(x / Block, y / Block)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(
      if (args.nonEmpty) args(0) else "src/test/resources/media/phash")
    outDir.mkdirs()
    grids.toSeq.sortBy(_._1).foreach { case (name, g) =>
      val f = new java.io.File(outDir, name)
      require(javax.imageio.ImageIO.write(render(g), "png", f),
        s"no PNG writer for $name")
      println(s"[media-fixtures] wrote $f hash=0x${analyticHash(g).toHexString}")
    }
  }
}
