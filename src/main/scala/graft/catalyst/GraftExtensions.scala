package graft.catalyst

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions wiring up the engine's custom Catalyst pieces
  * (SURVEY §7.4): the `labels_hash` expression and the regex→set
  * optimizer rule.
  *
  * Cluster deployment: `spark.sql.extensions=graft.catalyst.GraftExtensions`.
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.install]], which registers the same pieces through
  * the runtime hooks Spark exposes for that purpose.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.labelsHashDescription)
    ext.injectFunction(GraftExtensions.arrayDotDescription)
    ext.injectFunction(GraftExtensions.arrayL2SqDescription)
    ext.injectFunction(GraftExtensions.topTwoDescription)
    ext.injectOptimizerRule(_ => RegexSetRewrite)
  }
}

object GraftExtensions {
  private val labelsHashInfo = new ExpressionInfo(
    classOf[LabelsHash].getName, "labels_hash")

  private val labelsHashBuilder: Seq[Expression] => Expression = {
    case Seq(child) => LabelsHash(child)
    case args => throw new IllegalArgumentException(
      s"labels_hash expects 1 argument, got ${args.length}")
  }

  val labelsHashDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("labels_hash"), labelsHashInfo, labelsHashBuilder)

  private def binaryDescription(name: String, cls: Class[_], mk: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), {
      case Seq(l, r) => mk(l, r)
      case args => throw new IllegalArgumentException(
        s"$name expects 2 arguments, got ${args.length}")
    })

  val arrayDotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    binaryDescription("array_dot", classOf[ArrayDot], ArrayDot.apply)
  val arrayL2SqDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    binaryDescription("array_l2sq", classOf[ArrayL2Sq], ArrayL2Sq.apply)

  val topTwoDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("top2"),
      new ExpressionInfo(classOf[TopTwo].getName, "top2"), {
        case Seq(t, id, v) => TopTwo(t, id, v)
        case args => throw new IllegalArgumentException(
          s"top2 expects 3 arguments (t, id, v), got ${args.length}")
      })

  /** Idempotent runtime registration on a live session. */
  def install(spark: SparkSession): Unit = {
    Seq(labelsHashDescription, arrayDotDescription, arrayL2SqDescription,
      topTwoDescription)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
    if (!spark.experimental.extraOptimizations.contains(RegexSetRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RegexSetRewrite
    }
  }
}
