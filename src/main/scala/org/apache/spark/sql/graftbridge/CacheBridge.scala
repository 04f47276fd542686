package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** private[sql] access for DELIBERATE cross-query cache sharing: two
  * query definitions that cache an identical subplan (q54's shingle
  * projection and q55's MinHash input) share one CacheManager entry by
  * design — but the second `.cache()` call logs "Asked to cache already
  * cached data", which reads as a leak in a bench tail. cacheIfAbsent
  * makes the share explicit and silent.
  */
object CacheBridge {
  /** Cache `df` unless an equivalent plan is already cached. */
  def cacheIfAbsent(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val cm = cdf.sparkSession.sharedState.cacheManager
    if (cm.lookupCachedData(cdf).isEmpty) cdf.cache() else cdf
  }
}
