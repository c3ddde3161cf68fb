package graft.io

import org.apache.hadoop.conf.Configuration

/** Cloud object-store property surface — the reference's FileIO property
  * names (crates/iceberg/src/io/storage/config/{s3,gcs,azdls,oss,hf}.rs)
  * translated onto the Hadoop connector configuration this engine's
  * [[FileIO]] actually executes with (S3A, GCS connector, ABFS, Aliyun
  * OSS). A table created with reference-style properties (`s3.endpoint`,
  * `s3.access-key-id`, `client.region`, …) opens here without the user
  * renaming a single key.
  *
  * Scheme dispatch mirrors the reference's resolving storage
  * (crates/storage/opendal/src/resolving.rs:56-70): s3/s3a/s3n → s3,
  * gs/gcs → gcs, abfs(s)/wasb(s) → azdls, oss → oss, hf → hf,
  * file/"" → file, memory → memory; anything else is refused.
  *
  * No network is touched in this module — it is pure configuration
  * translation + URI parsing, unit-testable offline.
  */
object CloudStorage {

  // ---- reference property names (verbatim) ---------------------------
  // s3.rs:31-66
  val S3Endpoint = "s3.endpoint"
  val S3AccessKeyId = "s3.access-key-id"
  val S3SecretAccessKey = "s3.secret-access-key"
  val S3SessionToken = "s3.session-token"
  val S3Region = "s3.region"
  val ClientRegion = "client.region"
  val S3PathStyleAccess = "s3.path-style-access"
  val S3SseType = "s3.sse.type"
  val S3SseKey = "s3.sse.key"
  val S3SseMd5 = "s3.sse.md5"
  val S3AssumeRoleArn = "client.assume-role.arn"
  val S3AssumeRoleExternalId = "client.assume-role.external-id"
  val S3AssumeRoleSessionName = "client.assume-role.session-name"
  val S3AllowAnonymous = "s3.allow-anonymous"
  val S3DisableEc2Metadata = "s3.disable-ec2-metadata"
  val S3DisableConfigLoad = "s3.disable-config-load"
  // gcs.rs:31-49
  val GcsProjectId = "gcs.project-id"
  val GcsServicePath = "gcs.service.path"
  val GcsUserProject = "gcs.user-project"
  val GcsNoAuth = "gcs.no-auth"
  val GcsCredentialsJson = "gcs.credentials-json"
  val GcsToken = "gcs.oauth2.token"
  val GcsAllowAnonymous = "gcs.allow-anonymous"
  // azdls.rs:32-48
  val AdlsConnectionString = "adls.connection-string"
  val AdlsAccountName = "adls.account-name"
  val AdlsAccountKey = "adls.account-key"
  val AdlsSasToken = "adls.sas-token"
  val AdlsTenantId = "adls.tenant-id"
  val AdlsClientId = "adls.client-id"
  val AdlsClientSecret = "adls.client-secret"
  val AdlsAuthorityHost = "adls.authority-host"
  // oss.rs:29-33
  val OssEndpoint = "oss.endpoint"
  val OssAccessKeyId = "oss.access-key-id"
  val OssAccessKeySecret = "oss.access-key-secret"
  // hf.rs:27-31
  val HfToken = "hf.token"
  val HfEndpoint = "hf.endpoint"
  val HfRevision = "hf.revision"

  /** utils.rs:18 truthiness. */
  def isTruthy(v: String): Boolean =
    Set("true", "t", "1", "on").contains(v.toLowerCase)

  /** Normalized storage kind of a path (resolving.rs:56 parse_scheme). */
  def schemeOf(path: String): String = {
    val scheme = {
      val i = path.indexOf("://")
      if (i < 0) "" else path.substring(0, i).toLowerCase
    }
    scheme match {
      case "memory" => "memory"
      case "file" | "" => "file"
      case "s3" | "s3a" | "s3n" => "s3"
      case "gs" | "gcs" => "gcs"
      case "oss" => "oss"
      case "abfss" | "abfs" | "wasbs" | "wasb" => "azdls"
      case "hf" => "hf"
      case "hdfs" | "viewfs" => "hdfs" // native to Hadoop; no translation
      case s => throw new IllegalArgumentException(s"Unsupported storage scheme: $s")
    }
  }

  /** All applicable Hadoop conf entries for the given reference-style
    * properties — each connector's keys are namespaced (fs.s3a.*,
    * fs.gs.*, fs.azure.*, fs.oss.*) so the union is conflict-free and a
    * single Configuration serves every scheme, exactly like the
    * reference's one-properties-map-for-all-backends resolution. */
  def hadoopConf(props: Map[String, String]): Seq[(String, String)] =
    schemeImpls ++ s3Conf(props) ++ gcsConf(props) ++ adlsConf(props) ++ ossConf(props)

  /** Scheme → FileSystem impl bindings for aliases Hadoop does not map
    * by default (s3:// and s3n:// onto S3A, gs/gcs onto the GCS
    * connector, oss onto hadoop-aliyun). abfs(s)/wasb(s) ship in
    * hadoop-azure's service registry already. */
  def schemeImpls: Seq[(String, String)] = Seq(
    "fs.s3.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "fs.s3n.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "fs.gs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "fs.gcs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "fs.oss.impl" -> "org.apache.hadoop.fs.aliyun.oss.AliyunOSSFileSystem")

  /** s3.rs s3_config_parse → S3A keys. */
  def s3Conf(props: Map[String, String]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    props.get(S3Endpoint).foreach(v => out += "fs.s3a.endpoint" -> v)
    props.get(S3AccessKeyId).foreach(v => out += "fs.s3a.access.key" -> v)
    props.get(S3SecretAccessKey).foreach(v => out += "fs.s3a.secret.key" -> v)
    props.get(S3SessionToken).foreach(v => out += "fs.s3a.session.token" -> v)
    // s3.region wins over the generic client.region (s3.rs:60-65 order:
    // the dedicated key is read first, the fallback only fills a gap)
    props.get(S3Region).orElse(props.get(ClientRegion))
      .foreach(v => out += "fs.s3a.endpoint.region" -> v)
    // iceberg default = virtual-host style (S3FileIOProperties
    // PATH_STYLE_ACCESS_DEFAULT=false, s3.rs:42-47); S3A's default
    // agrees, so only an explicit property is forwarded
    props.get(S3PathStyleAccess)
      .foreach(v => out += "fs.s3a.path.style.access" -> isTruthy(v).toString)
    props.get(S3AssumeRoleArn).foreach { arn =>
      out += "fs.s3a.assumed.role.arn" -> arn
      out += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider"
    }
    props.get(S3AssumeRoleSessionName)
      .foreach(v => out += "fs.s3a.assumed.role.session.name" -> v)
    props.get(S3AssumeRoleExternalId)
      .foreach(v => out += "fs.s3a.assumed.role.external.id" -> v)
    // SSE (s3.rs:78-107): same four types, same refusal on an unknown one
    props.get(S3SseType).map(_.toLowerCase).foreach {
      case "none" => ()
      case "s3" => out += "fs.s3a.encryption.algorithm" -> "AES256"
      case "kms" =>
        out += "fs.s3a.encryption.algorithm" -> "SSE-KMS"
        props.get(S3SseKey).foreach(v => out += "fs.s3a.encryption.key" -> v)
      case "custom" =>
        out += "fs.s3a.encryption.algorithm" -> "SSE-C"
        props.get(S3SseKey).foreach(v => out += "fs.s3a.encryption.key" -> v)
      case other => throw new IllegalArgumentException(
        s"Invalid $S3SseType: $other. Expected one of (custom, kms, s3, none)")
    }
    if (props.get(S3AllowAnonymous).exists(isTruthy))
      out += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
    else if (props.get(S3SessionToken).isDefined)
      out += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    else if (props.get(S3DisableEc2Metadata).exists(isTruthy) ||
        props.get(S3DisableConfigLoad).exists(isTruthy))
      // no env/instance-profile fallback: static keys only
      out += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    out.result()
  }

  /** gcs.rs → GCS-connector keys. */
  def gcsConf(props: Map[String, String]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    props.get(GcsProjectId).foreach(v => out += "fs.gs.project.id" -> v)
    props.get(GcsServicePath).foreach(v => out += "fs.gs.storage.root.url" -> v)
    props.get(GcsUserProject).foreach { v =>
      out += "fs.gs.requester.pays.mode" -> "AUTO"
      out += "fs.gs.requester.pays.project.id" -> v
    }
    props.get(GcsCredentialsJson).foreach { v =>
      out += "fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE"
      out += "fs.gs.auth.service.account.json.keyfile" -> materializeKeyfile(v)
    }
    if (props.get(GcsNoAuth).exists(isTruthy) ||
        props.get(GcsAllowAnonymous).exists(isTruthy))
      out += "fs.gs.auth.type" -> "UNAUTHENTICATED"
    props.get(GcsToken).foreach(v => out += "fs.gs.auth.access.token" -> v)
    out.result()
  }

  /** The reference carries GCS credentials as base64 JSON content; the
    * Hadoop connector wants a keyfile PATH. Accept all three shapes:
    * a path is passed through, raw/base64 JSON is written to a private
    * temp file once per distinct content. */
  private val keyfileCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[io] def materializeKeyfile(v: String): String = {
    def writeTemp(json: String): String = keyfileCache.computeIfAbsent(json, _ => {
      val f = java.nio.file.Files.createTempFile("gcs-key-", ".json",
        java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
          java.nio.file.attribute.PosixFilePermissions.fromString("rw-------")))
      java.nio.file.Files.writeString(f, json)
      f.toFile.deleteOnExit()
      f.toString
    })
    if (v.trim.startsWith("{")) writeTemp(v)
    else {
      val decoded =
        try Some(new String(java.util.Base64.getDecoder.decode(v),
          java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: IllegalArgumentException => None }
      decoded.filter(_.trim.startsWith("{")).map(writeTemp).getOrElse(v) // a path
    }
  }

  /** azdls.rs → ABFS keys. Account-scoped keys require
    * `adls.account-name`; the endpoint suffix follows the reference's
    * default public-cloud endpoint (azdls.rs:232 `<account>.dfs.<suffix>`,
    * suffix `core.windows.net`). */
  def adlsConf(props: Map[String, String]): Seq[(String, String)] = {
    if (props.contains(AdlsConnectionString))
      throw new UnsupportedOperationException(
        "Azdls: connection string currently not supported") // azdls.rs:44-49
    val out = Seq.newBuilder[(String, String)]
    val suffix = "dfs.core.windows.net"
    props.get(AdlsAccountName).foreach { account =>
      val host = s"$account.$suffix"
      props.get(AdlsAccountKey).foreach { key =>
        out += s"fs.azure.account.auth.type.$host" -> "SharedKey"
        out += s"fs.azure.account.key.$host" -> key
      }
      props.get(AdlsSasToken).foreach { sas =>
        out += s"fs.azure.account.auth.type.$host" -> "SAS"
        out += s"fs.azure.sas.fixed.token.$host" -> sas
      }
      (props.get(AdlsClientId), props.get(AdlsClientSecret), props.get(AdlsTenantId)) match {
        case (Some(cid), Some(secret), Some(tenant)) =>
          val authority = props.getOrElse(AdlsAuthorityHost,
            "https://login.microsoftonline.com").stripSuffix("/")
          out += s"fs.azure.account.auth.type.$host" -> "OAuth"
          out += s"fs.azure.account.oauth.provider.type.$host" ->
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
          out += s"fs.azure.account.oauth2.client.id.$host" -> cid
          out += s"fs.azure.account.oauth2.client.secret.$host" -> secret
          out += s"fs.azure.account.oauth2.client.endpoint.$host" ->
            s"$authority/$tenant/oauth2/token"
        case _ => ()
      }
    }
    out.result()
  }

  /** oss.rs → hadoop-aliyun keys. */
  def ossConf(props: Map[String, String]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    props.get(OssEndpoint).foreach(v => out += "fs.oss.endpoint" -> v)
    props.get(OssAccessKeyId).foreach(v => out += "fs.oss.accessKeyId" -> v)
    props.get(OssAccessKeySecret).foreach(v => out += "fs.oss.accessKeySecret" -> v)
    out.result()
  }

  /** A Configuration carrying `base` plus every translated property. */
  def configure(props: Map[String, String], base: Configuration = new Configuration()): Configuration = {
    val conf = new Configuration(base)
    hadoopConf(props).foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

/** Parsed HuggingFace URI, grammar per the reference
  * (crates/storage/opendal/src/hf.rs:68):
  * `hf://<repo_type>/<repo_id>[@<revision>][/<path>]` — repo_type is
  * mandatory (models|datasets|spaces|buckets, singular accepted), the
  * revision may be URL-escaped (`%2F` → `/`) and the multi-segment
  * special refs `refs/convert/parquet` and `refs/pr/N` are recognized so
  * the path split lands after the full ref. */
final case class HfUri(repoType: String, repoId: String,
    revision: Option[String], path: String) {

  /** HTTP resolve URL for the file (the layout HF serves repo content
    * under; `hf.endpoint` overrides the public host, `hf.revision` is
    * the fallback when the URI pins none — token handling stays in the
    * caller's HTTP layer, never in the URI, matching hf.rs:186). */
  def resolveUrl(props: Map[String, String] = Map.empty): String = {
    val host = props.getOrElse(CloudStorage.HfEndpoint, "https://huggingface.co")
      .stripSuffix("/")
    val rev = revision.orElse(props.get(CloudStorage.HfRevision)).getOrElse("main")
    s"$host/$repoType/$repoId/resolve/$rev/$path"
  }
}

object HfUri {
  private val repoTypes = Map(
    "model" -> "models", "models" -> "models",
    "dataset" -> "datasets", "datasets" -> "datasets",
    "space" -> "spaces", "spaces" -> "spaces",
    "bucket" -> "buckets", "buckets" -> "buckets")

  /** hf.rs:86 parse; None when the repo-type prefix is missing/unknown. */
  def parse(fullUri: String): Option[HfUri] = {
    val s0 = if (fullUri.startsWith("hf://")) fullUri.substring(5) else fullUri
    if (s0.isEmpty) return None
    val firstSlash = s0.indexOf('/')
    if (firstSlash < 0) return None
    val repoType = repoTypes.get(s0.substring(0, firstSlash).toLowerCase.replace(" ", ""))
      .getOrElse(return None)
    val s = s0.substring(firstSlash + 1)

    if (s.contains("/")) {
      // `@` in the first two segments = revision on the repo_id
      val firstTwo = s.split("/", 3).take(2).mkString("/")
      if (firstTwo.contains("@")) {
        val at = s.indexOf('@')
        val repoId = s.substring(0, at)
        val revAndPath = s.substring(at + 1).replace("%2F", "/")
        val (rev, path) = splitRevision(revAndPath)
        Some(HfUri(repoType, repoId, Some(rev), path))
      } else {
        val segs = s.split("/", 3)
        val repoId = s"${segs(0)}/${segs(1)}"
        val path = if (segs.length > 2) segs(2) else ""
        Some(HfUri(repoType, repoId, None, path))
      }
    } else if (s.contains("@")) {
      val Array(repoId, rev) = s.split("@", 2)
      Some(HfUri(repoType, repoId, Some(rev).filter(_.nonEmpty), ""))
    } else Some(HfUri(repoType, s, None, ""))
  }

  /** hf.rs:129 path_after_revision, but keeping the revision too. */
  private def splitRevision(revAndPath: String): (String, String) = {
    if (!revAndPath.contains("/")) return (revAndPath, "")
    for (special <- Seq("refs/convert/", "refs/pr/")) {
      if (revAndPath.startsWith(special)) {
        val rest = revAndPath.substring(special.length)
        val i = rest.indexOf('/')
        return if (i < 0) (revAndPath, "")
        else (special + rest.substring(0, i), rest.substring(i + 1))
      }
    }
    val i = revAndPath.indexOf('/')
    (revAndPath.substring(0, i), revAndPath.substring(i + 1))
  }
}
