package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing mailbox read API (A1) — the Spark analog of the
  * reference's eight table functions (pst_extension.cpp:13-45,
  * table_function.hpp:68-76): one reader per MAPI object shape, all
  * backed by the same DSv2 source.
  */
object Mailbox {

  def read(
      spark: SparkSession,
      path: String,
      mode: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .format("mailbox")
      .option("mode", mode)
      .options(options)
      .load(path)

  /** read_pst_folders */
  def folders(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "folders", opts)
  /** read_pst_messages */
  def messages(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "messages", opts)
  /** read_pst_notes */
  def notes(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "notes", opts)
  /** read_pst_contacts */
  def contacts(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "contacts", opts)
  /** read_pst_appointments */
  def appointments(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "appointments", opts)
  /** read_pst_sticky_notes */
  def stickyNotes(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "sticky_notes", opts)
  /** read_pst_tasks */
  def tasks(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "tasks", opts)
  /** read_pst_distribution_lists */
  def distributionLists(s: SparkSession, path: String, opts: Map[String, String] = Map.empty): DataFrame =
    read(s, path, "distribution_lists", opts)
}
