package graft.config

import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Encryption-at-rest envelope for catalog secrets — the Spark-library
  * rendition of the reference's Cloak vault
  * (`/root/reference/lib/sequin/vault.ex:1-4` — AES-GCM cipher keyed by
  * a decoded env key; `lib/sequin/encrypted/field.ex:1-29` — the
  * encrypted Ecto column type every secret field uses). Same construction:
  * AES-256-GCM with a random 96-bit nonce per value, tag appended by the
  * cipher, the whole envelope base64url'd behind a versioned prefix so a
  * sealed value is self-describing wherever it is stored (config store,
  * exported YAML, API payloads).
  *
  * Discipline mirrored from the reference:
  *   - secrets are sealed on WRITE into the catalog and stay sealed in
  *     every at-rest representation (the exported YAML carries the
  *     ciphertext under `encrypted_headers` / password fields);
  *   - [[reveal]] is called only where a live connection is being
  *     constructed (transport-client / catalog-client build time) or
  *     where the API must show an obfuscated preview of the PLAINTEXT
  *     (never of the ciphertext — obfuscating ciphertext would leak
  *     nothing useful and mask key mismatches);
  *   - a wrong key fails loudly (GCM tag mismatch), never silently
  *     returns garbage.
  */
final class Vault(key: Array[Byte]) {
  require(key.length == 32,
    s"vault key must be 32 bytes (AES-256), got ${key.length}")
  private val spec = new SecretKeySpec(key, "AES")
  private val rng = new SecureRandom()

  /** Seal a plaintext: `vault:v1:` + base64url(nonce ++ ciphertext+tag). */
  def encrypt(plain: String): String = {
    val nonce = new Array[Byte](12)
    rng.nextBytes(nonce)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, spec, new GCMParameterSpec(128, nonce))
    val ct = c.doFinal(plain.getBytes(UTF_8))
    Vault.Prefix + java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(nonce ++ ct)
  }

  /** Open a sealed value; throws on a non-sealed input, a truncated
    * envelope, or a GCM tag mismatch (wrong key / tampered ciphertext).
    */
  def decrypt(sealed0: String): String = {
    require(Vault.isSealed(sealed0), "not a vault-sealed value")
    val raw = java.util.Base64.getUrlDecoder
      .decode(sealed0.stripPrefix(Vault.Prefix))
    require(raw.length > 12 + 16, "vault envelope truncated")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, spec,
      new GCMParameterSpec(128, raw, 0, 12))
    new String(c.doFinal(raw, 12, raw.length - 12), UTF_8)
  }

  /** Idempotent seal: an already-sealed value passes through (a config
    * re-apply of an exported YAML must not double-encrypt).
    */
  def seal(v: String): String = if (Vault.isSealed(v)) v else encrypt(v)

  /** Plaintext of a maybe-sealed value (plain inputs pass through). */
  def reveal(v: String): String = if (Vault.isSealed(v)) decrypt(v) else v
}

object Vault {
  /** Versioned envelope prefix — a value is secret-at-rest iff it
    * carries it.
    */
  val Prefix = "vault:v1:"

  def isSealed(v: String): Boolean = v != null && v.startsWith(Prefix)

  /** Key from its base64 (std or url) transport form — the reference
    * decodes `SEQUIN_VAULT_KEY` the same way (vault.ex `decode_key!`).
    */
  def fromBase64(b64: String): Vault =
    new Vault(
      try java.util.Base64.getDecoder.decode(b64)
      catch { case _: IllegalArgumentException =>
        java.util.Base64.getUrlDecoder.decode(b64) })

  /** A fresh random key (library embeddings that did not configure one
    * still get encryption at rest; the key lives only in-process, so
    * exported ciphertext is re-openable only by THIS instance — pass an
    * explicit key to share exports across instances/restarts).
    */
  def generate(): Vault = {
    val k = new Array[Byte](32)
    new SecureRandom().nextBytes(k)
    new Vault(k)
  }
}
