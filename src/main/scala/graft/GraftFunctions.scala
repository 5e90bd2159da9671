package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions._

/** SQL-surface registration of the engine's native expressions, so every
  * operator is reachable from plain `spark.sql(...)` — the reference's whole
  * API is SQL text, and a Spark-native replacement should accept SQL too.
  *
  * Two deployment forms:
  *  - [[GraftFunctions.register]]: imperative, for an existing session
  *    (tests, notebooks);
  *  - [[GraftExtensions]]: `spark.sql.extensions=graft.GraftExtensions` on a
  *    cluster — functions exist in every session from startup.
  */
object GraftFunctions {

  /** (name, arity check + constructor) for each native function. */
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> { es =>
      require(es.length == 4, "graft_minhash_sig(text, k, numHashes, seed)")
      MinHashSigExpr(es.head, intLit(es(1)), intLit(es(2)), longLit(es(3)))
    },
    "graft_simhash64" -> { es =>
      require(es.length == 1, "graft_simhash64(text)")
      SimHash64Expr(es.head)
    },
    "graft_shingle_set" -> { es =>
      require(es.length == 2, "graft_shingle_set(text, k)")
      ShingleSetExpr(NormalizeTextExpr(es.head), intLit(es(1)))
    },
    "graft_jaccard" -> { es =>
      require(es.length == 2, "graft_jaccard(arrayA, arrayB)")
      JaccardExpr(es.head, es(1))
    },
    "graft_cosine" -> { es =>
      require(es.length == 2, "graft_cosine(vecA, vecB)")
      CosineSimExpr(es.head, es(1))
    },
    "graft_lang_id" -> { es =>
      require(es.length == 1, "graft_lang_id(text)")
      LangIdExpr(es.head)
    },
    "graft_normalize_text" -> { es =>
      require(es.length == 1, "graft_normalize_text(text)")
      NormalizeTextExpr(es.head)
    },
    "graft_srp_sigs" -> { es =>
      require(es.length == 5, "graft_srp_sigs(vec, nBits, tables, dim, seed)")
      SrpSigsExpr(es.head, intLit(es(1)), intLit(es(2)), intLit(es(3)), longLit(es(4)))
    },
    "graft_sig_match" -> { es =>
      require(es.length == 2, "graft_sig_match(sigA, sigB)")
      SigMatchFractionExpr(es.head, es(1))
    },
    "graft_char_bigrams" -> { es =>
      require(es.length == 1, "graft_char_bigrams(filteredText)")
      CharBigramsExpr(es.head)
    },
    "graft_funnel_level" -> { es =>
      require(es.length == 3 || es.length == 4,
        "graft_funnel_level(sortedSeq, nSteps, windowSeconds[, mode]) — mode: 0 default, 1 strict_order, 2 strict_dedup")
      FunnelLevelExpr(es.head, intLit(es(1)), longLit(es(2)),
        if (es.length == 4) intLit(es(3)) else 0)
    },
    "graft_sorted_jaccard" -> { es =>
      require(es.length == 2, "graft_sorted_jaccard(sortedArrayA, sortedArrayB)")
      SortedJaccardExpr(es.head, es(1))
    },
    "graft_int_dot" -> { es =>
      require(es.length == 2, "graft_int_dot(intArrayA, intArrayB)")
      IntDotExpr(es.head, es(1))
    },
    "graft_masked_concat" -> { es =>
      require(es.length == 2, "graft_masked_concat(tokens, sortedRemovedPositions)")
      MaskedConcatExpr(es.head, es(1))
    },
    "graft_quantile_estimate" -> { es =>
      require(es.length == 2, "graft_quantile_estimate(state, q)")
      KllEstimateExpr(es.head, doubleLit(es(1)))
    },
    "graft_topk_estimate" -> { es =>
      require(es.length == 2, "graft_topk_estimate(state, k)")
      FreqTopKExpr(es.head, intLit(es(1)))
    },
    "graft_text_stats" -> { es =>
      require(es.length == 1, "graft_text_stats(text)")
      TextStatsExpr(es.head, TextAnalysis.Stopwords("en"))
    },
    "graft_bitmap_card" -> { es =>
      require(es.length == 1, "graft_bitmap_card(state)")
      BitmapCardExpr(es.head)
    },
    "graft_bitmap_and_card" -> { es =>
      require(es.length == 2, "graft_bitmap_and_card(stateA, stateB)")
      BitmapOpCardExpr(es.head, es(1), BitmapOpCardExpr.And)
    },
    "graft_bitmap_or_card" -> { es =>
      require(es.length == 2, "graft_bitmap_or_card(stateA, stateB)")
      BitmapOpCardExpr(es.head, es(1), BitmapOpCardExpr.Or)
    },
    "graft_bitmap_andnot_card" -> { es =>
      require(es.length == 2, "graft_bitmap_andnot_card(stateA, stateB)")
      BitmapOpCardExpr(es.head, es(1), BitmapOpCardExpr.AndNot)
    },
    "graft_cms_estimate" -> { es =>
      require(es.length == 2, "graft_cms_estimate(state, item)")
      CmsEstimateExpr(es.head, es(1))
    },
    "graft_cms_total" -> { es =>
      require(es.length == 1, "graft_cms_total(state)")
      CmsTotalExpr(es.head)
    },
    "graft_cms_state" -> { es =>
      require(es.length == 1, "graft_cms_state(col)")
      CmsStateAgg(es.head, CountMin.DefaultDepth, CountMin.DefaultWidth)
    },
    "graft_cms_merge_state" -> { es =>
      require(es.length == 1, "graft_cms_merge_state(state)")
      CmsMergeAgg(es.head)
    },
    // theta distinct states: aggregate functions registered bare — the
    // analyzer wraps a returned AggregateFunction in its AggregateExpression
    "graft_theta_state" -> { es =>
      require(es.length == 1 || es.length == 2, "graft_theta_state(col[, lgK])")
      ThetaStateAgg(es.head, if (es.length == 2) intLit(es(1)) else ThetaSketch.DefaultLgK)
    },
    "graft_theta_union_state" -> { es =>
      require(es.length == 1 || es.length == 2, "graft_theta_union_state(state[, lgK])")
      ThetaMergeAgg(es.head, if (es.length == 2) intLit(es(1)) else ThetaSketch.DefaultLgK)
    },
    "graft_theta_union" -> { es =>
      require(es.length == 2 || es.length == 3, "graft_theta_union(stateA, stateB[, lgK])")
      ThetaSetOpExpr(es.head, es(1), ThetaSetOpExpr.UnionOp,
        if (es.length == 3) intLit(es(2)) else ThetaSketch.DefaultLgK)
    },
    "graft_theta_intersect" -> { es =>
      require(es.length == 2 || es.length == 3, "graft_theta_intersect(stateA, stateB[, lgK])")
      ThetaSetOpExpr(es.head, es(1), ThetaSetOpExpr.IntersectOp,
        if (es.length == 3) intLit(es(2)) else ThetaSketch.DefaultLgK)
    },
    "graft_theta_anotb" -> { es =>
      require(es.length == 2 || es.length == 3, "graft_theta_anotb(stateA, stateB[, lgK])")
      ThetaSetOpExpr(es.head, es(1), ThetaSetOpExpr.AnotBOp,
        if (es.length == 3) intLit(es(2)) else ThetaSketch.DefaultLgK)
    },
    "graft_theta_estimate" -> { es =>
      require(es.length == 1, "graft_theta_estimate(state)")
      ThetaEstimateExpr(es.head)
    },
    "graft_theta_bounds_ok" -> { es =>
      require(es.length == 2 || es.length == 3,
        "graft_theta_bounds_ok(state, exact[, numStdDev])")
      ThetaBoundsExpr(es.head, es(1), if (es.length == 3) intLit(es(2)) else 3)
    })

  private def intLit(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }
  private def longLit(e: Expression): Long = e.eval(null) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"expected long literal, got $other")
  }
  private def doubleLit(e: Expression): Double = e.eval(null) match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"expected numeric literal, got $other")
  }

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
         new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
           "graft", name),
         builder))
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RewriteLatestWinsWindow)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
  }
}
