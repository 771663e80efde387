package graft

import graft.etl.Schemas

/** Schema-contract enforcement: the declared StructTypes must match what
  * the parquet files actually deliver (names, types, order, modulo
  * nullability) — upstream drift becomes a red test, not a silent wrong
  * answer. Also pins the typed core: Dataset[T] decoding must work for
  * the case-class entities. */
class SchemaSpec extends SparkSpec {

  private def shape(s: org.apache.spark.sql.types.StructType) =
    s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq

  test("every table matches its declared schema") {
    Schemas.all.foreach { case (name, declared) =>
      val actual = Tables.load(spark, sf, name).schema
      assert(shape(actual) == shape(declared),
        s"$name drifted:\n  actual=${shape(actual)}\n  declared=${shape(declared)}")
    }
  }

  test("typed core decodes: Dataset[T] for the entity case classes") {
    import spark.implicits._
    assert(Tables.nation(spark, sf).as[Schemas.Nation].head.n_name.nonEmpty)
    assert(Tables.customer(spark, sf).as[Schemas.Customer].head.c_custkey >= 0)
    assert(Tables.documents(spark, sf).as[Schemas.Document].head.doc_id >= 0)
    assert(Tables.embeddings(spark, sf).as[Schemas.Embedding].head.embedding.size == 64)
    assert(Tables.orders(spark, sf).as[Schemas.Order].head.o_orderkey >= 0)
  }
}
