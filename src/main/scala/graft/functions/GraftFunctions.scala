package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.core.{IceBucketExpr, IceTruncateBinaryExpr}

/** SQL registration of the library's native codegen expressions, so SQL
  * users reach the same operators the DataFrame API uses:
  *
  *   - `graft_bucket(col, n)` — the Iceberg bucket transform (murmur3
  *     byte-parity with the spec, `transforms.go:195-373`)
  *   - `graft_truncate_binary(col, w)` — binary truncate[W]
  *   - `graft_cosine_sim(a, b)` — cosine similarity over float/double arrays
  *   - `graft_equal_frac(a, b)` — fraction of equal array components
  *     (minhash signature agreement)
  *
  * Two entry points: [[GraftFunctions.register]] on an existing session, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session build
  * (the `SparkSessionExtensions` seam).
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case l: Literal => l.value match {
      case i: Int => i
      case l2: Long if l2 >= Int.MinValue && l2 <= Int.MaxValue => l2.toInt
      case l2: Long => throw new IllegalArgumentException(
        s"$fn: literal int argument out of range: $l2")
      case other => throw new IllegalArgumentException(
        s"$fn: expected a literal int, got $other")
    }
    case _ => throw new IllegalArgumentException(s"$fn: expected a literal int argument")
  }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn takes $n arguments, got ${args.length}")

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_bucket" -> { args =>
      arity(args, 2, "graft_bucket")
      IceBucketExpr(args.head, litInt(args(1), "graft_bucket"))
    },
    "graft_truncate_binary" -> { args =>
      arity(args, 2, "graft_truncate_binary")
      IceTruncateBinaryExpr(args.head, litInt(args(1), "graft_truncate_binary"))
    },
    "graft_cosine_sim" -> { args =>
      arity(args, 2, "graft_cosine_sim")
      CosineSimExpr(args.head, args(1))
    },
    "graft_equal_frac" -> { args =>
      arity(args, 2, "graft_equal_frac")
      EqualFracExpr(args.head, args(1))
    },
    "graft_minhash_sig" -> { args =>
      arity(args, 1, "graft_minhash_sig")
      MinHashSigExpr(args.head)
    },
    "graft_simhash" -> { args =>
      arity(args, 1, "graft_simhash")
      SimHashExpr(args.head)
    },
    // z-order clustering value (2-col pairwise form and the general N-col
    // array form — callers pass the pre-built long array for the latter)
    "graft_zorder2" -> { args =>
      arity(args, 2, "graft_zorder2")
      ZOrder2Expr(args.head, args(1))
    },
    "graft_zorder" -> { args =>
      arity(args, 1, "graft_zorder")
      ZOrderArrayExpr(args.head)
    },
    // bounded per-group top-k aggregate (score desc, id asc) — the
    // partial-aggregating re-rank primitive, exposed to SQL GROUP BY users
    "graft_top_k_by_score" -> { args =>
      arity(args, 3, "graft_top_k_by_score")
      TopKByScore(args.head, args(1), litInt(args(2), "graft_top_k_by_score"))
        .toAggregateExpression()
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftFunctions", name)

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info(name), builder)
  }
}

/** `spark.sql.extensions` entry point injecting the functions at session
  * construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftFunctionsInfo.info(name), builder))
    }
}

private object GraftFunctionsInfo {
  def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftFunctions", name)
}
