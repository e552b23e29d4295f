package graft.operators

/** Canonical-path tag for deriving per-sf-dir artifact names (IVF index
  * dirs, bucketed table names, partitioned-lake paths). Basename alone
  * would share artifacts between `/data/a/sf0.1` and `/data/b/sf0.1`;
  * naive sanitization ('/'→'_') collides `/data/x/sf0.1` with
  * `/data/x_sf0.1` — the canonical-path hash disambiguates both, and
  * canonicalization (not getAbsolutePath) folds '.'/'..'/symlink
  * spellings onto one tag so engine and statically-generated oracle SQL
  * agree however the dir is spelled. (String.hashCode is specified by
  * the JLS — stable across JVMs, safe to bake into on-disk layouts.)
  */
object PathTag {
  def tagFor(dir: String): String = {
    val f = new java.io.File(dir)
    val canonical =
      try f.getCanonicalPath catch { case _: java.io.IOException => f.getAbsolutePath }
    val base = new java.io.File(canonical).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    f"$base-${canonical.hashCode & 0xffffffffL}%08x"
  }
}
