package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.s3.SigV4

/** SigV4 canonicalization corner cases from the public AWS signing rules —
  * the ones a self-consistent signer/verifier pair can get wrong together
  * and only real AWS/MinIO would catch.
  */
class SigV4Spec extends AnyFunSuite {

  test("uriEncode: space is %20, '~' unreserved, '*' and '+' encoded, UTF-8 bytes") {
    assert(SigV4.uriEncode("a b") == "a%20b")
    assert(SigV4.uriEncode("ti~lde") == "ti~lde")
    assert(SigV4.uriEncode("st*r") == "st%2Ar")
    assert(SigV4.uriEncode("a+b") == "a%2Bb")
    assert(SigV4.uriEncode("k=v&w") == "k%3Dv%26w")
    assert(SigV4.uriEncode("é") == "%C3%A9") // é -> two UTF-8 bytes
    assert(SigV4.uriEncode("a/b") == "a%2Fb")
    assert(SigV4.uriEncode("a/b", encodeSlash = false) == "a/b")
  }

  test("canonicalQuery sorts by key name then value, not by the k=v string") {
    // '1' (0x31) < '=' (0x3D): a full-string sort puts tag1=v before tag=x;
    // AWS sorts by key name, so tag comes first.
    assert(SigV4.canonicalQuery("tag1=v&tag=x") == "tag=x&tag1=v")
    // duplicate keys ordered by value
    assert(SigV4.canonicalQuery("a=2&a=10") == "a=10&a=2")
    // bare flags get an empty value and participate in the sort
    assert(SigV4.canonicalQuery("uploads&prefix=p") == "prefix=p&uploads=")
  }

  test("canonicalQuery recanonicalizes the URLEncoder wire form to AWS form") {
    // '+' for space and %7E for '~' must come out as %20 and bare '~'
    assert(SigV4.canonicalQuery("prefix=a+b") == "prefix=a%20b")
    assert(SigV4.canonicalQuery("prefix=a%20b") == "prefix=a%20b")
    assert(SigV4.canonicalQuery("prefix=%7Ehome") == "prefix=~home")
    // reserved chars inside values stay encoded (uppercase hex)
    assert(SigV4.canonicalQuery("marker=k%3Dv%26w") == "marker=k%3Dv%26w")
    assert(SigV4.canonicalQuery("") == "")
    assert(SigV4.canonicalQuery(null) == "")
  }
}
