package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object queries {
  /** Session-free `$"colName"` interpolator (same shape as
    * `spark.implicits._`, but usable in static query definitions). */
  implicit class ColInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
