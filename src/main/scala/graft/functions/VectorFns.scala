package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT/DOUBLE>` embedding columns as pure column
  * expressions (`zip_with`/`aggregate`/`transform` — codegen-friendly, no
  * UDF). Sums fold left-to-right in array order, matching DuckDB's list
  * functions, which keeps cosine values engine-portable bit-for-bit.
  */
object VectorFns {

  /** Cast a float array to double before arithmetic (float inputs are
    * exactly representable; all math then happens in double). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
