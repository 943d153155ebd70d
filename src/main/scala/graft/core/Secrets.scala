package graft.core

/** Named-credential registry mirroring the reference's secret types `d1`
  * and `r2_sql` (CREATE SECRET ... TYPE d1) on top of Spark-friendly
  * config: programmatic registration, Spark/Hadoop conf keys, and the
  * reference's env-var fallbacks.
  *
  * Reference:
  *  - d1 secret (required ACCOUNT_ID + API_TOKEN, redacted api_token):
  *    /root/reference/src/d1_secret.cpp:12-103
  *  - r2_sql secret: /root/reference/src/r2_secret.cpp:11-97
  *  - env fallbacks CLOUDFLARE_ACCOUNT_ID / CLOUDFLARE_API_TOKEN /
  *    CLOUDFLARE_D1_DATABASE_ID: /root/reference/src/d1_functions.cpp:44-88
  *
  * Conf convention: `spark.cloudflare.<type>.<name>.accountId` /
  * `.apiToken` / `.databaseId`.
  */
object Secrets {

  final case class Secret(
      name: String,
      secretType: String, // "d1" | "r2_sql"
      accountId: String,
      apiToken: String,
      databaseId: String = "") {
    /** Redacts the token, like the reference's redact_keys. */
    override def toString: String =
      s"Secret($name, type=$secretType, accountId=$accountId, apiToken=***, " +
        s"databaseId=$databaseId)"
  }

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Secret]()

  def register(secret: Secret): Unit = {
    require(secret.accountId.nonEmpty, s"Secret '${secret.name}' requires accountId")
    require(secret.apiToken.nonEmpty, s"Secret '${secret.name}' requires apiToken")
    registry.put(key(secret.secretType, secret.name), secret)
  }

  def drop(secretType: String, name: String): Unit = registry.remove(key(secretType, name))

  def clear(): Unit = registry.clear()

  private def key(t: String, n: String) = s"$t/$n"

  private def env(k: String): Option[String] = sys.env.get(k).filter(_.nonEmpty)

  /** Look up by explicit name; `conf` lets SparkConf-provided credentials
    * participate without a hard dependency on a session here.
    */
  def lookup(secretType: String, name: String,
             conf: String => Option[String] = _ => None): Option[Secret] = {
    Option(registry.get(key(secretType, name))).orElse {
      val prefix = s"spark.cloudflare.$secretType.$name"
      for {
        acct <- conf(s"$prefix.accountId")
        tok <- conf(s"$prefix.apiToken")
      } yield Secret(name, secretType, acct, tok,
        conf(s"$prefix.databaseId").getOrElse(""))
    }
  }

  /** Default-name probing order used by ATTACH when no SECRET given:
    * `d1`, `cloudflare`, `__default_d1` (reference:
    * /root/reference/src/d1_storage.cpp:113-135), then environment.
    */
  def resolveD1(explicitName: Option[String],
                conf: String => Option[String] = _ => None): Option[Secret] = {
    explicitName match {
      case Some(n) => lookup("d1", n, conf)
      case None =>
        Seq("d1", "cloudflare", "__default_d1").iterator
          .flatMap(n => lookup("d1", n, conf)).nextOption()
          .orElse {
            for {
              acct <- env("CLOUDFLARE_ACCOUNT_ID")
              tok <- env("CLOUDFLARE_API_TOKEN")
            } yield Secret("__env", "d1", acct, tok,
              env("CLOUDFLARE_D1_DATABASE_ID").getOrElse(""))
          }
    }
  }

  def d1Config(secret: Secret, databaseId: String = "",
               apiBase: String = "https://api.cloudflare.com/client/v4"): D1Client.Config =
    D1Client.Config(secret.accountId, secret.apiToken,
      if (databaseId.nonEmpty) databaseId else secret.databaseId, apiBase)
}
