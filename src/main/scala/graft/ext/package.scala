package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object ext {
  /** Session-free `$"colName"` interpolator (mirrors spark.implicits). */
  implicit class ColInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
