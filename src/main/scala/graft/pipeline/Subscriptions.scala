package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subscription-registry semantics (SURVEY.md §2.2 K8/K9): the reference's
  * telegram_users table ops re-expressed as set algebra over an immutable
  * table — the engine-native form of INSERT … ON CONFLICT DO NOTHING and
  * keyed DELETE (/root/reference/src/telegram_listener.py:25-49).
  *
  * Scale notes: both are key-only anti-joins — the payload of the
  * existing table never moves for the membership check, and with the
  * registry bucketed by chat_id the anti-join is shuffle-free.
  */
object Subscriptions {

  /** K8: insert-ignore — first write wins, existing rows untouched. */
  def subscribe(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val fresh = incoming
      .join(existing.select("chat_id"), Seq("chat_id"), "left_anti")
      // in-batch duplicates: keep the earliest join per chat_id
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chat_id").orderBy(col("joined_at").asc)))
      .filter(col("rn") === 1).drop("rn")
    existing.unionByName(fresh)
  }

  /** K9: keyed delete — drop every row whose chat_id appears in `keys`. */
  def unsubscribe(existing: DataFrame, keys: DataFrame): DataFrame =
    existing.join(keys.select("chat_id"), Seq("chat_id"), "left_anti")
}
