package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregate functions for signature sketches.
  *
  * MinHash and SimHash signatures need 64 parallel lanes folded over every
  * token/shingle hash. Expressing that as 64 separate `min()`/`sum(when())`
  * aggregate columns blows up the generated code (past Janino limits —
  * falling back to interpreted evaluation) and makes a 64-field aggregation
  * row. A single [[TypedImperativeAggregate]] with a primitive-array buffer
  * does the same work in one tight loop per input row, keeps map-side
  * partial aggregation (buffers merge), and shrinks the shuffled state to
  * one binary blob per group.
  */
object SignatureAggs {
  val Lanes = 64
  val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic LCG-derived permutation coefficients (shared with the
    * Dedup operator docs). */
  def permA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MersennePrime match {
    case 0 => 1L; case a => a
  }
  def permB(i: Int): Long = (69069L * (i + 7) + 362437L) % MersennePrime

  private val as: Array[Long] = Array.tabulate(Lanes)(permA)
  private val bs: Array[Long] = Array.tabulate(Lanes)(permB)

  /** MinHash signature: per lane i, min over inputs of (a_i*h + b_i) mod P.
    * Input: a base hash in [0, P) (e.g. pmod(xxhash64(shingle), P)).
    * Output: array<long> of 64 lane minima.
    */
  case class MinHashSig(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Long] = Array.fill(Lanes)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < Lanes) {
          val x = (as(i) * h + bs(i)) % MersennePrime
          if (x < buf(i)) buf(i) = x
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Lanes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(Lanes * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(Lanes)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(n: Int): MinHashSig = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): MinHashSig = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** SimHash signature: per bit b, sign of sum over inputs of ±1 depending
    * on bit b of the input hash. Input: any 64-bit hash (e.g. xxhash64 of a
    * token). Output: the 64-bit signature as a long.
    */
  case class SimHashSig(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Int] = new Array[Int](Lanes)

    override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var b = 0
        while (b < Lanes) {
          buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < Lanes) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Int]): Any = {
      var sig = 0L
      var b = 0
      while (b < Lanes) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }

    override def serialize(buf: Array[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(Lanes * 4)
      buf.foreach(bb.putInt)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(Lanes)(bb.getInt)
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(n: Int): SimHashSig = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): SimHashSig = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
    override def prettyName: String = "simhash_sig"
  }

  /** Register both sketch aggregates in the session so they are usable as
    * `expr("minhash_sig(h)")` / `expr("simhash_sig(h)")` in DataFrame aggs
    * and in SQL text. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head).toAggregateExpression(), "built-in")
  }
}
