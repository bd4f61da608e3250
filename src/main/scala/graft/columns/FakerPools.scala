package graft.columns

import graft.spec.SpecError

/** Offline faker: deterministic driver-side pools of realistic-looking
  * values, combined from bundled word lists (zero-egress analog of the
  * reference's 10k-entry Faker pool — core/engine/columns/faker_pool.py).
  * The pool becomes an array literal + element_at pick: no UDF.
  * Pools are seeded with java.util.Random (stable LCG across JVMs).
  */
object FakerPools {

  val FirstNames: IndexedSeq[String] = IndexedSeq(
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael", "linda",
    "david", "elizabeth", "william", "barbara", "richard", "susan", "joseph",
    "jessica", "thomas", "sarah", "charles", "karen", "christopher", "lisa",
    "daniel", "nancy", "matthew", "betty", "anthony", "margaret", "mark",
    "sandra", "donald", "ashley", "steven", "kimberly", "paul", "emily",
    "andrew", "donna", "joshua", "michelle", "kenneth", "carol", "kevin",
    "amanda", "brian", "dorothy", "george", "melissa", "timothy", "deborah",
    "ronald", "stephanie", "edward", "rebecca", "jason", "sharon", "jeffrey",
    "laura", "ryan", "cynthia", "jacob", "kathleen", "gary", "amy").map(_.capitalize)

  val LastNames: IndexedSeq[String] = IndexedSeq(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "nguyen", "hill", "flores", "green",
    "adams", "nelson", "baker", "hall", "rivera", "campbell", "mitchell",
    "carter", "roberts").map(_.capitalize)

  val Cities: IndexedSeq[String] = IndexedSeq(
    "Springfield", "Riverton", "Fairview", "Kingston", "Georgetown", "Salem",
    "Madison", "Clinton", "Arlington", "Ashland", "Dover", "Oxford", "Milton",
    "Newport", "Clayton", "Dayton", "Lexington", "Milford", "Auburn",
    "Bristol", "Burlington", "Centerville", "Chester", "Clifton", "Columbia",
    "Concord", "Danville", "Edison", "Farmington", "Franklin", "Glendale",
    "Greenville", "Hamilton", "Hudson", "Jackson", "Lancaster", "Manchester",
    "Marion", "Monroe", "Princeton", "Quincy", "Richmond", "Rochester",
    "Shelby", "Troy", "Union", "Vernon", "Warren", "Waverly", "Winchester")

  val Countries: IndexedSeq[String] = IndexedSeq(
    "US", "GB", "DE", "FR", "JP", "CN", "IN", "BR", "CA", "AU", "IT", "ES",
    "MX", "KR", "NL", "SE", "CH", "PL", "BE", "AR", "NO", "AT", "DK", "FI",
    "IE", "PT", "GR", "CZ", "RO", "HU", "NZ", "SG", "IL", "ZA", "TH", "MY",
    "PH", "VN", "ID", "TR")

  val StreetSuffixes: IndexedSeq[String] = IndexedSeq(
    "St", "Ave", "Blvd", "Dr", "Ln", "Rd", "Ct", "Pl", "Way", "Ter")

  val CompanyWords: IndexedSeq[String] = IndexedSeq(
    "Acme", "Global", "Pioneer", "Summit", "Vertex", "Nova", "Quantum",
    "Stellar", "Apex", "Fusion", "Horizon", "Cobalt", "Zenith", "Atlas",
    "Beacon", "Cascade", "Delta", "Echo", "Falcon", "Granite")

  val CompanySuffixes: IndexedSeq[String] = IndexedSeq(
    "Inc", "LLC", "Ltd", "Corp", "Group", "Holdings", "Partners", "Labs",
    "Systems", "Industries")

  val EmailDomains: IndexedSeq[String] = IndexedSeq(
    "example.com", "example.org", "example.net", "mail.example.com",
    "test.example.org")

  /** Deterministic pool of `size` values for `provider`. */
  def pool(provider: String, size: Int, globalSeed: Long): Seq[String] = {
    require(size > 0 && size <= 10000, s"faker pool size must be 1..10000, got $size")
    val rnd = new java.util.Random(globalSeed * 31L + provider.hashCode)
    def pick[T](xs: IndexedSeq[T]): T = xs(rnd.nextInt(xs.length))
    (0 until size).map { _ =>
      provider match {
        case "first_name" => pick(FirstNames)
        case "last_name" => pick(LastNames)
        case "name" => s"${pick(FirstNames)} ${pick(LastNames)}"
        case "email" =>
          s"${pick(FirstNames).toLowerCase}.${pick(LastNames).toLowerCase}${rnd.nextInt(100)}@${pick(EmailDomains)}"
        case "company" => s"${pick(CompanyWords)} ${pick(CompanyWords)} ${pick(CompanySuffixes)}"
        case "city" => pick(Cities)
        case "country" => pick(Countries)
        case "street_address" => s"${1 + rnd.nextInt(9999)} ${pick(LastNames)} ${pick(StreetSuffixes)}"
        case "phone_number" => f"${200 + rnd.nextInt(800)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d"
        case "word" => ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length))
        case other => throw SpecError(s"unknown faker provider '$other'; supported: first_name, " +
          "last_name, name, email, company, city, country, street_address, phone_number, word")
      }
    }
  }
}
