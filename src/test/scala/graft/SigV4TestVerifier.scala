package graft

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Independent SigV4 implementation (written from the published spec
  * text, deliberately NOT the production signer) used by the AWS-client
  * specs to re-derive and verify request signatures server-side.
  */
object SigV4TestVerifier {
  private def hmac(key: Array[Byte], s: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(s.getBytes(UTF_8))
  }
  private def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  def signature(secret: String, region: String, service: String,
      amzDate: String, headers: Seq[(String, String)],
      payload: Array[Byte]): String = {
    val sorted = headers.sortBy(_._1)
    val canonical = "POST\n/\n\n" +
      sorted.map { case (k, v) => s"$k:${v.trim}\n" }.mkString + "\n" +
      sorted.map(_._1).mkString(";") + "\n" + sha(payload)
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val sts = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope + "\n" +
      sha(canonical.getBytes(UTF_8))
    val k = hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes(UTF_8), date),
      region), service), "aws4_request")
    hmac(k, sts).map("%02x".format(_)).mkString
  }
}
