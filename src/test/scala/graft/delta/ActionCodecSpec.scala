package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format tests against hand-authored commit-log lines shaped exactly
  * like the reference's golden tables (FIXTURES.md "Commit-log line shape",
  * lifted from the delta-0.2.0 / delta-0.8.0 fixture layouts). */
class ActionCodecSpec extends AnyFunSuite {

  // Authoritative line shapes (same field set/order as Spark/delta-rs logs).
  private val protocolLine = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private val metaDataLine =
    """{"metaData":{"id":"22ef18ba-191c-4c36-a606-3dad5cdf3830","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"value\",\"type\":\"integer\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{},"createdTime":1564524294376}}"""
  private val addLine =
    """{"add":{"path":"part-00000-b44fcdb0-8b06-4f3a-8606-f8311a96f6dc-c000.snappy.parquet","partitionValues":{},"size":396,"modificationTime":1564524294000,"dataChange":true}}"""
  private val addWithStatsLine =
    """{"add":{"path":"part-00000-04ec9591-0b73-459e-8d18-ba5711d6cbe1-c000.snappy.parquet","partitionValues":{},"size":440,"modificationTime":1615043776000,"dataChange":true,"stats":"{\"numRecords\":2,\"minValues\":{\"value\":0},\"maxValues\":{\"value\":2},\"nullCount\":{\"value\":0}}"}}"""
  private val removeLine =
    """{"remove":{"path":"part-00001-911a94a2-43f6-4acb-8620-5e68c2654989-c000.snappy.parquet","deletionTimestamp":1615043776735,"dataChange":true,"extendedFileMetadata":true,"partitionValues":{},"size":445}}"""
  private val txnLine = """{"txn":{"appId":"e4a20b59-dd0e-4c50-b074-e8ae4786df30","version":0}}"""
  private val partitionedAddLine =
    """{"add":{"path":"year=2020/month=1/day=1/part-00000-8eafa330-3be9-4a39-ad78-fd13c2027c7e.c000.snappy.parquet","partitionValues":{"year":"2020","month":"1","day":"1"},"size":414,"modificationTime":1615555646000,"dataChange":true}}"""

  test("protocol line parses") {
    assert(ActionCodec.fromJsonLine(protocolLine).contains(ProtocolAction(1, 2)))
  }

  test("metaData line parses with exact fields") {
    val Some(md: MetaDataAction) = ActionCodec.fromJsonLine(metaDataLine)
    assert(md.id == "22ef18ba-191c-4c36-a606-3dad5cdf3830")
    assert(md.format == Format("parquet", Map.empty))
    assert(md.partitionColumns.isEmpty)
    assert(md.createdTime.contains(1564524294376L))
    assert(DeltaSchema.fromJson(md.schemaString).fieldNames.sameElements(Array("value")))
  }

  test("add line parses") {
    val Some(a: AddAction) = ActionCodec.fromJsonLine(addLine)
    assert(a.path.startsWith("part-00000-b44fcdb0"))
    assert(a.size == 396 && a.dataChange && a.stats.isEmpty)
  }

  test("add with embedded JSON stats parses") {
    val Some(a: AddAction) = ActionCodec.fromJsonLine(addWithStatsLine)
    val st = a.stats.flatMap(ActionCodec.statsFromJson).get
    assert(st.numRecords == 2)
    assert(st.minValues("value").asInt == 0)
    assert(st.maxValues("value").asInt == 2)
    assert(st.nullCount("value").asInt == 0)
  }

  test("remove with extended metadata parses (delta-0.8.0 tombstone, size 445)") {
    val Some(r: RemoveAction) = ActionCodec.fromJsonLine(removeLine)
    assert(r.size.contains(445L)) // rust/tests/read_delta_test.rs:132-144
    assert(r.extendedFileMetadata.contains(true))
    assert(r.deletionTimestamp == 1615043776735L)
  }

  test("txn line parses") {
    assert(ActionCodec.fromJsonLine(txnLine)
      .contains(TxnAction("e4a20b59-dd0e-4c50-b074-e8ae4786df30", 0)))
  }

  test("partitioned add carries partitionValues map") {
    val Some(a: AddAction) = ActionCodec.fromJsonLine(partitionedAddLine)
    assert(a.partitionValues == Map("year" -> "2020", "month" -> "1", "day" -> "1"))
  }

  test("serialization round-trips every action type") {
    val actions: Seq[Action] = Seq(
      ProtocolAction(1, 2),
      MetaDataAction("id1", Some("n"), None, Format(),
        """{"type":"struct","fields":[]}""", Seq("p"), Some(5L), Map("k" -> "v")),
      AddAction("a.parquet", 10, Map("p" -> "1"), 99, dataChange = true,
        stats = Some("""{"numRecords":1,"minValues":{},"maxValues":{},"nullCount":{}}""")),
      RemoveAction("a.parquet", 100, dataChange = true, Some(true), Some(Map("p" -> "1")), Some(10L)),
      TxnAction("app", 7, Some(123L)))
    actions.foreach { a =>
      assert(ActionCodec.fromJsonLine(ActionCodec.toJsonLine(a)).contains(a), s"round-trip $a")
    }
  }

  test("null partition value round-trips (HIVE default partition)") {
    val a = AddAction("x=__HIVE_DEFAULT_PARTITION__/f.parquet", 1, Map("x" -> null), 0, true)
    val Some(b: AddAction) = ActionCodec.fromJsonLine(ActionCodec.toJsonLine(a))
    assert(b.partitionValues == Map("x" -> null))
  }

  test("nested stats recurse as raw JSON (rust/src/action.rs:848-914 analog)") {
    val json = """{"numRecords":22,"minValues":{"a":1,"nested":{"b":2,"c":"a"}},"maxValues":{"a":10,"nested":{"b":20,"c":"z"}},"nullCount":{"a":1,"nested":{"b":0,"c":1}}}"""
    val st = ActionCodec.statsFromJson(json).get
    assert(st.numRecords == 22)
    assert(st.minValues("nested").get("b").asInt == 2)
    assert(st.maxValues("nested").get("c").asText == "z")
    assert(st.nullCount("nested").get("c").asInt == 1)
  }

  test("malformed stats degrade to None, not an exception") {
    assert(ActionCodec.statsFromJson("not json at all").isEmpty)
    assert(ActionCodec.statsFromJson("""["array"]""").isEmpty)
    assert(ActionCodec.statsFromJson("""{"noNumRecords":1}""").isEmpty)
  }

  test("missing required fields raise diagnosable errors, not NPEs") {
    val e1 = intercept[IllegalArgumentException] {
      ActionCodec.fromJsonLine("""{"add":{"size":10}}""")
    }
    assert(e1.getMessage.contains("add") && e1.getMessage.contains("path"))
    val e2 = intercept[IllegalArgumentException] {
      ActionCodec.fromJsonLine("""{"txn":{"appId":"a"}}""")
    }
    assert(e2.getMessage.contains("version"))
    val e3 = intercept[IllegalArgumentException] {
      ActionCodec.fromJsonLine("""{"metaData":{"id":"x"}}""")
    }
    assert(e3.getMessage.contains("schemaString"))
  }

  test("unknown action types are skipped (forward compatibility)") {
    assert(ActionCodec.fromJsonLine("""{"somethingNew":{"path":"x"}}""").isEmpty)
  }

  test("cdc actions decode with tolerant defaults") {
    val a = ActionCodec.fromJsonLine(
      """{"cdc":{"path":"_change_data/f.parquet","size":42,"dataChange":false}}""")
    assert(a.contains(CdcAction("_change_data/f.parquet", 42L)))
  }

  test("logEntry is newline-delimited, one action per line") {
    val entry = ActionCodec.logEntry(Seq(ProtocolAction(), TxnAction("a", 1)))
    val lines = entry.split('\n')
    assert(lines.length == 2)
    assert(lines.forall(l => ActionCodec.fromJsonLine(l).isDefined))
  }
}
