package graft.delta

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** Wire-level DynamoDB [[LockBackend]]: the DynamoDB JSON API
  * (`DynamoDB_20120810.*` targets) over the shared SigV4 HTTP client —
  * the reference's ACTUAL lock store (`rust/src/storage/s3/dynamodb_lock`)
  * spoken natively, no SDK. Each backend instance guards ONE lock item
  * (`lockKey`), and every trait op maps to exactly one conditional
  * PutItem/DeleteItem — the four condition expressions the reference
  * issues:
  *
  *  - [[putIfAbsent]]            → `attribute_not_exists(#k)`
  *  - [[putIfReleased]]          → `attribute_exists(#k) AND attribute_exists(#rel)`
  *  - [[putIfRvnMatches]]        → `attribute_exists(#k) AND #r = :rvn`
  *  - [[putIfOwnerAndRvnMatch]]  → `attribute_exists(#k) AND #o = :o AND #r = :rvn`
  *  - [[deleteIfOwnerAndRvnMatch]] → DeleteItem with the same condition
  *
  * A condition miss surfaces as `ConditionalCheckFailedException` → the
  * op returns false, atomically at the endpoint — the whole protocol
  * correctness story ([[DynamoStyleLockClient]]) sits ABOVE this seam and
  * is already model- and storm-proven; this class makes the seam real
  * over HTTP. Reads use `ConsistentRead` (the lock protocol assumes
  * read-your-writes). Attribute names ride `#` placeholders throughout
  * (`data`/`owner` collide with DynamoDB reserved words). */
final class DynamoDbHttpLockBackend(endpoint: String, region: String,
                                    accessKey: String, secretKey: String,
                                    tableName: String, lockKey: String)
    extends LockBackend {

  private val aws = new AwsSigV4Http(endpoint, region, "dynamodb",
    accessKey, secretKey)
  private val mapper = ActionCodec.mapper

  private def call(target: String, body: ObjectNode): (Int, JsonNode) = {
    // the SigV4 client already retries 5xx + I/O errors; DynamoDB signals
    // throttling as HTTP 400 with a __type the client can't see into, so
    // that class retries HERE (safe: every op is an endpoint-side
    // conditional write or a consistent read — replay cannot double-apply)
    var attempt = 0
    while (true) {
      if (attempt > 0) Thread.sleep(100L << (attempt - 1))
      attempt += 1
      val r = aws.send("POST", "/",
        payload = mapper.writeValueAsBytes(body),
        extraHeaders = Seq(
          "x-amz-target" -> s"DynamoDB_20120810.$target",
          "content-type" -> "application/x-amz-json-1.0"))
      val node =
        if (r.body().isEmpty) mapper.createObjectNode()
        else mapper.readTree(r.body())
      val t = Option(node.get("__type")).map(_.asText).getOrElse("")
      val throttled = r.statusCode() == 400 &&
        (t.contains("ProvisionedThroughputExceededException") ||
          t.contains("ThrottlingException") ||
          t.contains("RequestLimitExceeded"))
      if (!throttled || attempt >= 4) return (r.statusCode(), node)
    }
    throw new IllegalStateException("unreachable")
  }

  private def conditional(target: String, body: ObjectNode): Boolean = {
    val (code, node) = call(target, body)
    if (code / 100 == 2) true
    else {
      val t = Option(node.get("__type")).map(_.asText).getOrElse("")
      if (t.contains("ConditionalCheckFailedException")) false
      else throw new java.io.IOException(
        s"DynamoDB $target failed: HTTP $code ${node.toString.take(300)}")
    }
  }

  private def s(v: String): ObjectNode = {
    val n = mapper.createObjectNode(); n.put("S", v); n
  }
  private def keyNode: ObjectNode = {
    val k = mapper.createObjectNode(); k.set[ObjectNode]("lockKey", s(lockKey)); k
  }
  private def itemOf(r: LockRecord): ObjectNode = {
    val item = mapper.createObjectNode()
    item.set[ObjectNode]("lockKey", s(lockKey))
    item.set[ObjectNode]("ownerName", s(r.ownerName))
    item.set[ObjectNode]("rvn", s(r.recordVersionNumber))
    r.leaseDurationSecs.foreach { l =>
      val n = mapper.createObjectNode(); n.put("N", l.toString)
      item.set[ObjectNode]("leaseDuration", n)
    }
    // the reference models IS_RELEASED as attribute-presence
    if (r.isReleased) item.set[ObjectNode]("isReleased", s("1"))
    r.data.foreach(d => item.set[ObjectNode]("data", s(d)))
    item
  }
  private def names(pairs: (String, String)*): ObjectNode = {
    val n = mapper.createObjectNode()
    pairs.foreach { case (k, v) => n.put(k, v) }
    n
  }

  private def putWith(r: LockRecord, cond: String,
                      exprNames: ObjectNode,
                      exprValues: Option[ObjectNode]): Boolean = {
    val b = mapper.createObjectNode()
    b.put("TableName", tableName)
    b.set[ObjectNode]("Item", itemOf(r))
    b.put("ConditionExpression", cond)
    b.set[ObjectNode]("ExpressionAttributeNames", exprNames)
    exprValues.foreach(b.set[ObjectNode]("ExpressionAttributeValues", _))
    conditional("PutItem", b)
  }

  override def get(): Option[LockRecord] = {
    val b = mapper.createObjectNode()
    b.put("TableName", tableName)
    b.set[ObjectNode]("Key", keyNode)
    b.put("ConsistentRead", true)
    val (code, node) = call("GetItem", b)
    if (code / 100 != 2) throw new java.io.IOException(
      s"DynamoDB GetItem failed: HTTP $code ${node.toString.take(300)}")
    Option(node.get("Item")).filter(_.isObject).map { item =>
      def str(a: String): Option[String] =
        Option(item.get(a)).flatMap(n => Option(n.get("S"))).map(_.asText)
      LockRecord(
        ownerName = str("ownerName").getOrElse(""),
        recordVersionNumber = str("rvn").getOrElse(""),
        leaseDurationSecs = Option(item.get("leaseDuration"))
          .flatMap(n => Option(n.get("N"))).map(_.asText.toLong),
        isReleased = item.has("isReleased"),
        data = str("data"))
    }
  }

  override def putIfAbsent(r: LockRecord): Boolean =
    putWith(r, "attribute_not_exists(#k)", names("#k" -> "lockKey"), None)

  override def putIfReleased(r: LockRecord): Boolean =
    putWith(r, "attribute_exists(#k) AND attribute_exists(#rel)",
      names("#k" -> "lockKey", "#rel" -> "isReleased"), None)

  override def putIfRvnMatches(r: LockRecord, expectedRvn: String): Boolean = {
    val v = mapper.createObjectNode(); v.set[ObjectNode](":rvn", s(expectedRvn))
    putWith(r, "attribute_exists(#k) AND #r = :rvn",
      names("#k" -> "lockKey", "#r" -> "rvn"), Some(v))
  }

  override def putIfOwnerAndRvnMatch(r: LockRecord, owner: String,
                                     rvn: String): Boolean = {
    val v = mapper.createObjectNode()
    v.set[ObjectNode](":o", s(owner)); v.set[ObjectNode](":rvn", s(rvn))
    putWith(r, "attribute_exists(#k) AND #o = :o AND #r = :rvn",
      names("#k" -> "lockKey", "#o" -> "ownerName", "#r" -> "rvn"), Some(v))
  }

  override def deleteIfOwnerAndRvnMatch(owner: String, rvn: String): Boolean = {
    val b = mapper.createObjectNode()
    b.put("TableName", tableName)
    b.set[ObjectNode]("Key", keyNode)
    b.put("ConditionExpression",
      "attribute_exists(#k) AND #o = :o AND #r = :rvn")
    b.set[ObjectNode]("ExpressionAttributeNames",
      names("#k" -> "lockKey", "#o" -> "ownerName", "#r" -> "rvn"))
    val v = mapper.createObjectNode()
    v.set[ObjectNode](":o", s(owner)); v.set[ObjectNode](":rvn", s(rvn))
    b.set[ObjectNode]("ExpressionAttributeValues", v)
    conditional("DeleteItem", b)
  }

  /** Create the lock table (tooling/tests; idempotent — an existing table
    * succeeds). Pay-per-request, single S hash key `lockKey`. */
  def createTable(): Unit = {
    // node API, not string interpolation — a tableName carrying a quote
    // or backslash must escape correctly, like every other call here
    val b = mapper.createObjectNode()
    b.put("TableName", tableName)
    val attr = mapper.createObjectNode()
    attr.put("AttributeName", "lockKey"); attr.put("AttributeType", "S")
    b.set[ObjectNode]("AttributeDefinitions",
      mapper.createArrayNode().add(attr))
    val key = mapper.createObjectNode()
    key.put("AttributeName", "lockKey"); key.put("KeyType", "HASH")
    b.set[ObjectNode]("KeySchema", mapper.createArrayNode().add(key))
    b.put("BillingMode", "PAY_PER_REQUEST")
    val (code, node) = call("CreateTable", b)
    val t = Option(node.get("__type")).map(_.asText).getOrElse("")
    require(code / 100 == 2 || t.contains("ResourceInUseException"),
      s"CreateTable $tableName: HTTP $code ${node.toString.take(300)}")
  }
}
