package graft.api

import graft.spec.ColumnStrategy

/** Sugar mirroring the reference's text-factory surface
  * (dbldatagen/text_generator_plugins.py:181-451): bind a locale once, then
  * mint faker strategies per provider; or wrap an arbitrary `Long => String`
  * as a plugin strategy. */
final case class FakerTextFactory(locale: String = "en", poolSize: Int = 10000) {
  /** `factory("email")` -> a Faker column strategy in this locale. */
  def apply(provider: String): ColumnStrategy.Faker =
    ColumnStrategy.Faker(provider, poolSize, locale)
}

object PyfuncTextFactory {
  /** Wrap a deterministic function of the cell seed as a text strategy
    * (the reference's PyfuncText plugin analog; runs as a Scala UDF). */
  def apply(fn: Long => String): ColumnStrategy.Plugin = ColumnStrategy.Plugin(fn)
}
