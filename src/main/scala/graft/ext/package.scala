package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

package object ext {
  /** Session-free `$"colName"` interpolator (mirrors spark.implicits). */
  implicit class ColInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** The one persist spelling ext operators use: MEMORY_AND_DISK plus
    * registration with the caller's [[CacheScope]] when one is active
    * (session-lifetime otherwise — see the contract in [[CacheScope]]). */
  private[graft] implicit class ScopedPersist(private val df: DataFrame) extends AnyVal {
    def persistScoped: DataFrame = CacheScope.persist(df)
  }
}
