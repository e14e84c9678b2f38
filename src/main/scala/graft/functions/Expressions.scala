package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the hot vector math.
  *
  * `cosine_sim` replaces the `aggregate(zip_with(...))` composition: the
  * higher-order array functions are CodegenFallback (interpreted, one
  * closure call per element), while this expression generates a single
  * fused loop inside whole-stage codegen — the preference order of the
  * build contract (native Expression > composed HOFs > UDF). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  // callers cast inputs to array<double> explicitly (Similarity.cosineCol)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); nb += v * v; j += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double graftDot = 0.0, graftNa = 0.0, graftNb = 0.0;
         |int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  double graftX = $a.getDouble(graftI);
         |  double graftY = $b.getDouble(graftI);
         |  graftDot += graftX * graftY;
         |  graftNa += graftX * graftX;
         |  graftNb += graftY * graftY;
         |}
         |for (int graftJ = graftN; graftJ < $a.numElements(); graftJ++) {
         |  double graftV = $a.getDouble(graftJ); graftNa += graftV * graftV;
         |}
         |for (int graftK = graftN; graftK < $b.numElements(); graftK++) {
         |  double graftV = $b.getDouble(graftK); graftNb += graftV * graftV;
         |}
         |double graftDen = java.lang.Math.sqrt(graftNa) * java.lang.Math.sqrt(graftNb);
         |${ev.value} = graftDen == 0.0 ? 0.0 : graftDot / graftDen;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native NFC normalization — Spark has no built-in Unicode
  * normalization function, and a Scala UDF would break whole-stage
  * codegen. The generated code takes the `isNormalized` fast path
  * (no allocation for the overwhelmingly-already-NFC web corpus) and
  * only materializes a new string when composition actually changes
  * something. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |String graftNfcS = $c.toString();
         |if (java.text.Normalizer.isNormalized(graftNfcS, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize(graftNfcS, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session-extension registration — the deployment-grade hook of the
  * build contract ("registered via SparkSessionExtensions"): launch with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and every session, including
  * spark-submit jobs and thrift-server sessions, gets the native
  * functions without any driver-side register() call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}

object GraftFunctions {

  /** Registration (idempotent): `SELECT cosine_sim(v1, v2) FROM ...`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
  }

  /** Unicode NFC normalization of a string column (codegen'd). */
  def nfc_normalize(s: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("nfc_normalize", s)
  }

  /** cosine similarity of two array<double> columns (codegen'd). Spark 4
    * hides Column.expr, so the Column-side handle goes through the function
    * registry + call_function. */
  def cosine_sim(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }
}
