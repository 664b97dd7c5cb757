package graft

import graft.config.Vault
import org.scalatest.funsuite.AnyFunSuite

/** Secrets-at-rest envelope (reference `vault.ex` + `encrypted/field.ex`):
  * AES-256-GCM round-trip, idempotent sealing, loud failure on tamper or
  * key mismatch — never silent garbage.
  */
class VaultSpec extends AnyFunSuite {

  private def keyB64(seed: Byte): String =
    java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](32)(seed))

  test("round-trip: sealed value opens to the plaintext; nonces make " +
      "every envelope distinct; plaintext never appears in the envelope") {
    val v = Vault.fromBase64(keyB64(7))
    val sealed1 = v.encrypt("hunter2-secret")
    val sealed2 = v.encrypt("hunter2-secret")
    assert(Vault.isSealed(sealed1) && sealed1.startsWith("vault:v1:"))
    assert(sealed1 != sealed2) // random nonce per seal
    assert(!sealed1.contains("hunter2"))
    assert(v.decrypt(sealed1) == "hunter2-secret")
    assert(v.decrypt(sealed2) == "hunter2-secret")
  }

  test("seal is idempotent and reveal passes plain values through") {
    val v = Vault.fromBase64(keyB64(1))
    val s1 = v.seal("pw")
    assert(v.seal(s1) == s1) // a re-applied export must not double-seal
    assert(v.reveal("plain") == "plain")
    assert(v.reveal(s1) == "pw")
  }

  test("wrong key and tampered ciphertext fail loudly (GCM tag)") {
    val a = Vault.fromBase64(keyB64(2))
    val b = Vault.fromBase64(keyB64(3))
    val sealed0 = a.encrypt("s3cr3t")
    intercept[Exception](b.decrypt(sealed0))
    val raw = java.util.Base64.getUrlDecoder
      .decode(sealed0.stripPrefix(Vault.Prefix))
    raw(raw.length - 1) = (raw(raw.length - 1) ^ 0x01).toByte
    val tampered = Vault.Prefix + java.util.Base64.getUrlEncoder
      .withoutPadding().encodeToString(raw)
    intercept[Exception](a.decrypt(tampered))
    intercept[IllegalArgumentException](a.decrypt("not-sealed"))
  }

  test("a 32-byte key is required; base64 std and url forms both decode") {
    intercept[IllegalArgumentException](
      Vault.fromBase64(java.util.Base64.getEncoder
        .encodeToString(Array.fill[Byte](16)(0))))
    val urlForm = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(Array.fill[Byte](32)(9))
    assert(Vault.fromBase64(urlForm).decrypt(
      Vault.fromBase64(urlForm).encrypt("x")) == "x")
  }
}
