package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Database OAuth credential generation — the A22 surface (reference:
  * generate_oauth_token.py:14-30 and pg_connect.py:14-46, which call
  * the workspace `generate_database_credential` API with a fresh
  * request UUID and the PG instance name, then use the returned token
  * as `PGPASSWORD` for the SCD sink's Postgres connection).
  *
  * The underlying REST call (what the reference's SDK wrapper issues):
  *
  *   `POST {host}/api/2.0/database/credentials` with
  *   `Authorization: Bearer {workspaceToken}` and body
  *   `{"request_id": "<uuid>", "instance_names": ["<instance>"]}`
  *   → `{"token": "<oauth token>", "expiration_time": "<timestamp>"}`
  *
  * Transport reuses [[UnityCatalogClient.HttpCall]] (JDK
  * HttpURLConnection; certified against an in-process
  * `com.sun.net.httpserver` fake in TierASpec — the sandbox has no
  * egress). Tokens are short-lived, so [[jdbcProps]] vends a FRESH
  * token at call time — callers build their
  * [[JdbcUpsertSink.JdbcConnectionFactory]] from the returned
  * properties immediately before a sync, never caching them across
  * syncs (the reference regenerates per run, pg_connect.py:105-110).
  *
  * Driver-side metadata only: one HTTP round-trip per sync, nothing in
  * the distributed write path (the executors' JDBC connections receive
  * the already-vended password through the serialized factory).
  */
final class DatabaseCredentialClient(
    host: String,
    workspaceToken: String,
    httpCall: UnityCatalogClient.HttpCall = UnityCatalogClient.jdkHttp) {

  private val mapper = new ObjectMapper()

  /** A22: request id + instance names → OAuth token. */
  def generateDatabaseCredential(
      requestId: String,
      instanceNames: Seq[String]): DatabaseCredentialClient.DbCredential = {
    val payload = mapper.createObjectNode()
    payload.put("request_id", requestId)
    val arr = payload.putArray("instance_names")
    instanceNames.foreach(arr.add)
    val body = httpCall(s"$host/api/2.0/database/credentials", "POST",
      workspaceToken, Some(mapper.writeValueAsString(payload)))
    val node = mapper.readTree(body)
    val tok = Option(node.get("token")).map(_.asText()).getOrElse(
      throw new IllegalStateException(
        s"database credential response has no token: $body"))
    DatabaseCredentialClient.DbCredential(tok,
      Option(node.get("expiration_time")).map(_.asText()).getOrElse(""))
  }

  /** JDBC connection properties for the SCD sink: the vended token is
    * the password (the reference's `PGPASSWORD = token`,
    * pg_connect.py:52). A fresh token is generated on every call. */
  def jdbcProps(username: String, instanceName: String): Map[String, String] = {
    val cred = generateDatabaseCredential(
      java.util.UUID.randomUUID().toString, Seq(instanceName))
    Map("user" -> username, "password" -> cred.token)
  }

  /** The reference's diagnostic instance listing
    * (test_db_instances.py:17-24: `list_database_instances()`, printing
    * name/id/state per instance) — the SDK wrapper over
    * `GET {host}/api/2.0/database/instances` →
    * `{"database_instances": [{"name": …, "id"?: …, "state"?: …}]}`.
    * Driver-side metadata only; used to discover the instance name the
    * credential call needs when it isn't configured. */
  def listDatabaseInstances(): Seq[DatabaseCredentialClient.DbInstance] = {
    val body = httpCall(s"$host/api/2.0/database/instances", "GET",
      workspaceToken, None)
    val node = mapper.readTree(body)
    Option(node.get("database_instances")) match {
      case None => Seq.empty
      case Some(arr) =>
        (0 until arr.size()).map { i =>
          val n = arr.get(i)
          DatabaseCredentialClient.DbInstance(
            Option(n.get("name")).map(_.asText()).getOrElse(""),
            Option(n.get("id")).map(_.asText()).getOrElse(""),
            Option(n.get("state")).map(_.asText()).getOrElse(""))
        }
    }
  }
}

object DatabaseCredentialClient {
  /** The reference's result shape (pg_connect.py:43-46). */
  final case class DbCredential(token: String, expirationTime: String)

  /** One row of the diagnostic listing (test_db_instances.py:20-24). */
  final case class DbInstance(name: String, id: String, state: String)
}
