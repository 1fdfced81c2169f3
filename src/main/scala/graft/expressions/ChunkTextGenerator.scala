package graft.expressions

import graft.text.{Chunker, RecursiveCharacterTextSplitter}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The chunker (A8) as a Catalyst Generator (UDTF): 1 document row → N chunk
  * rows, exposing the recursive character splitter to the SQL surface via
  * `LATERAL VIEW chunk_text(text)` (SURVEY.md §4 custom-work item 1 —
  * promoted from Dataset.flatMap for SQL parity).
  *
  * chunk_text(text) or chunk_text(text, size, overlap); size/overlap must be
  * foldable. Emits (chunk_id INT, chunk STRING) with the reference's
  * chunk_text semantics (normalize each chunk, drop whitespace-only —
  * embedding_utils.py:176-186).
  */
case class ChunkTextGenerator(children: Seq[Expression])
    extends Expression with Generator with CodegenFallback {

  def this(child: Expression) = this(Seq(child))

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  @transient private lazy val splitter: RecursiveCharacterTextSplitter = {
    val size = if (children.length > 1) children(1).eval(null).asInstanceOf[Number].intValue() else 400
    val overlap = if (children.length > 2) children(2).eval(null).asInstanceOf[Number].intValue() else 100
    new RecursiveCharacterTextSplitter(size, overlap)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty || children.length > 3)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "chunk_text expects (text[, size, overlap])")
    else if (children.head.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_text expects a string column, got ${children.head.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = children.head.eval(input)
    if (v == null) Nil
    else Chunker.chunkText(v.asInstanceOf[UTF8String].toString, splitter)
      .zipWithIndex
      .map { case (c, i) => InternalRow(i, UTF8String.fromString(c)) }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "chunk_text"
}
