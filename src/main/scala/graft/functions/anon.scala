package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.fakegen.FakeGen

/** Column-level API for the anonymization functions — the Spark face of
  * the reference's transformator registry (SURVEY.md §2.4). All are
  * deterministic in (cell value, seed); null propagates (null in =>
  * null out), matching the reference's Option-mapping behavior.
  */
object anon {

  // cast("string") is a no-op (constant-folded) when the column is
  // already string; it keeps the expression well-typed for anything else.
  private def fake(kind: Int, c: Column, seed: Long): Column =
    Bridge.column(FakeExpr(Bridge.expression(c.cast("string")), kind, seed))

  def fakeFirstName(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindFirstName, c, seed)
  def fakeLastName(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindLastName, c, seed)
  def fakeName(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindFullName, c, seed)
  def fakeCompanyName(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindCompany, c, seed)
  def fakeEmail(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindEmail, c, seed)
  def fakeAddress(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindAddress, c, seed)
  /** Reference name `fake_md5_transformation` — actually a UUIDv4 string
    * (transformator.rs:40,60). */
  def fakeUuid(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindUuid, c, seed)
  def fakePhone(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindPhone, c, seed)
  def fakeMultiEmail(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    fake(FakeGen.KindMultiEmail, c, seed)

  /** `fake_email_with_id_prefix_transformation`: "{id}-{fakeEmail(email)}"
    * — the reference's only two-column compute
    * (fake_email_with_id_prefix_transformator.rs:19-62); in Spark it is a
    * plain row-wise expression. Null email => null (concat propagates). */
  def fakeEmailWithIdPrefix(id: Column, email: Column,
                            seed: Long = FakeGen.DefaultSeed): Column =
    concat(id.cast("string"), lit("-"), fakeEmail(email, seed))

  /** `retain_if_empty` wrapper (transformator.rs:93-103): empty-string and
    * NULL cells keep the original value instead of being faked. */
  def retainIfEmpty(original: Column, faked: Column): Column =
    when(original.isNull || original === lit(""), original).otherwise(faked)

  /** Null-byte sanitization for one string column: any cell containing
    * \x00 becomes NULL — whole cell, not a strip; the reference nulls the
    * cell because a \x00 truncates JSON payloads downstream
    * (anonymization_dataframe_operator.rs:330-366). */
  def sanitizeNullBytes(c: Column): Column =
    when(c.contains(lit("\u0000")), lit(null).cast("string")).otherwise(c)
}
