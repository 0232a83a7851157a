package graft

import org.apache.spark.sql.types._

/** Mechanical enforcement of the repo's op invariants (CLAUDE.md) over the
  * ENTIRE registry, so every future op is checked the moment it registers:
  *
  *  - every op has a DuckDB oracle (rows-only ops must be consciously rare);
  *  - output schemas are FLAT primitives — an array/map/struct output column
  *    is a hash-compare hazard (the driver sorts columns by name and hashes
  *    values; nested values render differently across engines);
  *  - no duplicate or empty column names (the sort-by-name compare would
  *    silently pair wrong columns);
  *  - ids are unique and kebab-case.
  *
  * Schema checks run on the ANALYZED plan only (no job executes).
  */
class OpContractSpec extends SparkSpec {

  private lazy val ops = SparkEntry.allOps

  test("every registered op id is unique and kebab-case") {
    val ids = ops.map(_.id)
    assert(ids.distinct.size === ids.size, "duplicate op ids")
    ids.foreach(id => assert(id.matches("[a-z0-9]+([_-][a-z0-9]+)*"), id))
  }

  test("every registered op carries a DuckDB oracle") {
    val rowsOnly = ops.filter(_.oracle.isEmpty).map(_.id)
    assert(rowsOnly.isEmpty,
      s"ops without an oracle get only a weak rows-check: $rowsOnly")
  }

  test("every op's output schema is flat primitive columns with unique names") {
    val allowed: PartialFunction[DataType, Unit] = {
      case _: StringType | _: LongType | _: IntegerType | _: DoubleType |
           _: BooleanType | _: ShortType | _: FloatType | _: DecimalType |
           _: TimestampType | _: DateType | _: BinaryType => ()
    }
    ops.foreach { op =>
      val schema = op.build(spark, sf()).schema
      val names = schema.fields.map(_.name)
      assert(names.distinct.length === names.length,
        s"${op.id}: duplicate column names ${names.mkString(",")}")
      names.foreach(n => assert(n.nonEmpty && !n.contains("("),
        s"${op.id}: unaliased/auto-generated column name '$n'"))
      schema.fields.foreach { f =>
        assert(allowed.isDefinedAt(f.dataType),
          s"${op.id}: column ${f.name} has nested/non-hashable type ${f.dataType} " +
            "— explode to rows instead (CLAUDE.md invariant)")
      }
    }
  }

  test("oracle SQL aliases every output column of its op (name-set match)") {
    // the driver sorts columns BY NAME before hashing — a name present on
    // one side only breaks the pairing. Cheap structural proxy: every
    // Spark output column name appears verbatim in the oracle text.
    ops.foreach { op =>
      val sqlText = op.oracle.get.toLowerCase
      val names = op.build(spark, sf()).schema.fieldNames
      names.foreach { n =>
        assert(sqlText.contains(n.toLowerCase),
          s"${op.id}: output column '$n' never mentioned in its oracle SQL")
      }
    }
  }
}
