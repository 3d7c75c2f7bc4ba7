package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the GFA tag-field parse — one compiled loop over the
  * tag field array (top-level object so generated Java can call the
  * static forwarder, like [[HyperplaneSigKernel]]).
  *
  * Bit-exact twin of the Column-DSL formulation it replaced
  * (`map_from_entries(transform(filter(fields, ≥2 colons),
  * struct(substring_index(t, ":", 1), after-first-colon)))`): a field is
  * a tag iff it contains at least two colons; key = text before the
  * first colon, value = everything after it ("TYPE:VALUE"). Duplicate
  * tag names raise, matching map_from_entries under the default
  * EXCEPTION map-key-dedup policy. The HOF chain was interpreted per
  * element (lambda frames + a regex match + a struct allocation per tag
  * field, measured as the parse layer's largest cost at corpus scale);
  * this is one loop with UTF8String position arithmetic.
  */
object GfaTagMapKernel {
  private val Colon = UTF8String.fromString(":")

  def compute(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val keys = new java.util.ArrayList[AnyRef](n)
    val vals = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (t != null) {
        val c1 = t.indexOf(Colon, 0)
        if (c1 >= 0 && t.indexOf(Colon, c1 + 1) >= 0) {
          val key = t.substring(0, c1)
          var j = 0
          while (j < keys.size()) {
            if (keys.get(j) == key)
              // matches map_from_entries under the default EXCEPTION
              // map-key-dedup policy: duplicate tag names are an error
              throw new RuntimeException(
                s"Duplicate map key ${key.toString} was found, please " +
                "check the input data. If you want to remove the " +
                "duplicated keys, you can set spark.sql.mapKeyDedupPolicy " +
                "to \"LAST_WIN\".")
            j += 1
          }
          keys.add(key)
          vals.add(t.substring(c1 + 1, t.numChars()))
        }
      }
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(vals.toArray))
  }
}

/** GFA tag list (array<string>) → map tag -> "TYPE:VALUE", computed in
  * one codegen'd pass (see [[GfaTagMapKernel]]).
  */
case class GfaTagMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    GfaTagMapKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GfaTagMapKernel.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): GfaTagMap =
    copy(child = newChild)
}

object GfaFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Codegen'd GFA tag parse over an array<string> of raw tag fields. */
  def gfa_tag_map(fields: Column): Column =
    Bridge.column(GfaTagMap(Bridge.expression(fields)))
}
