package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for non-broadcastable equi-joins.
  *
  * A shuffled join hashes each side by the join key, so one heavy-hitter
  * key (the bot user, the empty-string document, the null-ish sentinel id)
  * lands its ENTIRE row population in one task — at 100 TB that one task
  * runs for hours while the rest of the cluster idles, or OOMs. AQE's
  * skew-join split handles this for sort-merge joins when statistics
  * surface it; salting is the explicit, planner-independent form, and the
  * only option when the probe side must stay hash-partitioned (e.g. a
  * stored layout) or AQE is unavailable.
  *
  * `saltedEquiJoin` rewrites `left ⋈ right ON leftKey = rightKey` as an
  * equi-join on `(key, salt)`: each LEFT row gets one of `salts`
  * pseudo-random salt values (derived from a per-row id — the salt only
  * changes WHERE a row is processed, never whether it matches), and the
  * RIGHT side is replicated once per salt value. The heavy key's rows now
  * spread over `salts` tasks at the cost of a `salts`× replication of the
  * right side — which is why the right side should be the SMALLER
  * relation (too big to broadcast, small enough to replicate; the classic
  * mid-size dimension). Inner joins only: result equality with the plain
  * join is exact (q95 pins it against the plain-join oracle).
  */
object Skew {

  /** `left ⋈ right ON leftKey = rightKey` with the left side salted
    * `salts` ways and the right side replicated per salt. Returns the
    * same rows as the plain inner join. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = "__graft_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"column name $saltCol is reserved by saltedEquiJoin")
    // per-row salt: xxhash64 over the row's CONTENT (every left column).
    // A row's salt is then a pure function of its values — identical
    // across runs AND across task recomputations, so a fetch-failure
    // retry at scale replays one map task instead of forcing Spark's
    // indeterminate-stage rollback of the whole downstream stage set
    // (the monotonically_increasing_id alternative is correct but
    // indeterminate: the id depends on per-partition row order). The
    // heavy key still spreads because its rows differ in payload;
    // rows identical in EVERY column share a salt — acceptable residual
    // skew (exact duplicates are the degenerate case, and `salts`-way
    // spreading of distinct payloads is the point). hash(leftKey) alone
    // would be useless: every copy of the heavy key would get the SAME
    // salt.
    val saltedLeft = left.withColumn(saltCol,
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)))
    val replicatedRight = right.withColumn(saltCol,
      explode(lit((0L until salts.toLong).toArray)))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft(saltCol) === replicatedRight(saltCol))
      .drop(saltCol)
  }
}
