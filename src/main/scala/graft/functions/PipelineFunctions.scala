package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the pipeline SCALAR kernels (the behavioral
  * aggregate family registers via `graft.behavioral.BehavioralFunctions` /
  * `GraftExtensions`). The reference engine is SQL-first, so the dedup /
  * similarity / text kernels must be reachable from SQL text, not just the
  * Scala Column API:
  *
  * {{{
  *   graft.functions.PipelineFunctions.register(spark)
  *   spark.sql("""
  *     SELECT doc_id, simhash64(split(trim(text), '\\s+')) AS fp
  *     FROM documents""")
  * }}}
  *
  * Kernels with a static Int parameter (`minhash_signature`,
  * `winnow_fingerprint`, `winnow_minima`, `ngram_repetition`) take it as a
  * literal int argument, extracted at resolution time — a non-literal
  * there fails analysis with a clear message rather than planning a
  * kernel whose shape would have to vary per row.
  */
object PipelineFunctions {

  /** All (name, builder) pairs — shared by the per-session `register` and
    * the cluster-wide `GraftExtensions` injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { exprs =>
      require(exprs.length == 1, "simhash64(tokens_array)")
      Simhash64(exprs.head)
    },
    "simhash_md5_hex" -> { exprs =>
      require(exprs.length == 1, "simhash_md5_hex(tokens_array)")
      SimhashMd5Hex(exprs.head)
    },
    "minhash_signature" -> { exprs =>
      require(exprs.length == 2, "minhash_signature(hash_array, numHashes)")
      MinhashSignature(exprs(0), litInt(exprs(1), "numHashes"))
    },
    "winnow_fingerprint" -> { exprs =>
      require(exprs.length == 3, "winnow_fingerprint(text, k, w)")
      WinnowFingerprint(exprs(0), litInt(exprs(1), "k"), litInt(exprs(2), "w"))
    },
    "winnow_minima" -> { exprs =>
      require(exprs.length == 2, "winnow_minima(hash_array, w)")
      WinnowMinima(exprs(0), litInt(exprs(1), "w"))
    },
    "ngram_repetition" -> { exprs =>
      require(exprs.length == 2, "ngram_repetition(tokens_array, n)")
      NgramRepetition(exprs(0), litInt(exprs(1), "n"))
    },
    "dot_product" -> { exprs =>
      require(exprs.length == 2, "dot_product(array, array)")
      DotProduct(exprs(0), exprs(1))
    },
    "sorted_intersect_count" -> { exprs =>
      require(exprs.length == 2, "sorted_intersect_count(sorted_array, sorted_array)")
      SortedIntersectCount(exprs(0), exprs(1))
    },
    "sorted_intersect_count_long" -> { exprs =>
      require(exprs.length == 2,
        "sorted_intersect_count_long(sorted_array, sorted_array)")
      SortedIntersectCountLong(exprs(0), exprs(1))
    },
    // bounded top-k heap AGGREGATES (the registry accepts AggregateFunction
    // builders directly, like the behavioral family)
    "prefix_topk" -> { exprs =>
      require(exprs.length == 3, "prefix_topk(k, df, h)")
      PrefixTopK(exprs)
    },
    "score_topk" -> { exprs =>
      require(exprs.length == 3, "score_topk(k, score, id)")
      ScoreTopK(exprs)
    })

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$what must be a literal INT, got ${other.sql}")
  }

  /** Per-session registration (the programmatic path, like
    * `BehavioralFunctions.register`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
