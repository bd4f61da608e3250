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

  val States: IndexedSeq[String] = IndexedSeq(
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana", "Maine",
    "Maryland", "Massachusetts", "Michigan", "Minnesota", "Mississippi",
    "Missouri", "Montana", "Nebraska", "Nevada", "New Hampshire", "New Jersey",
    "New Mexico", "New York", "North Carolina", "North Dakota", "Ohio",
    "Oklahoma", "Oregon", "Pennsylvania", "Rhode Island", "South Carolina",
    "South Dakota", "Tennessee", "Texas", "Utah", "Vermont", "Virginia",
    "Washington", "West Virginia", "Wisconsin", "Wyoming")

  val Jobs: IndexedSeq[String] = IndexedSeq(
    "Accountant", "Architect", "Baker", "Carpenter", "Chef", "Chemist",
    "Dentist", "Designer", "Developer", "Electrician", "Engineer", "Farmer",
    "Firefighter", "Journalist", "Lawyer", "Librarian", "Mechanic", "Nurse",
    "Optician", "Pharmacist", "Photographer", "Pilot", "Plumber", "Scientist",
    "Surveyor", "Teacher", "Translator", "Veterinarian", "Waiter", "Welder")

  val Colors: IndexedSeq[String] = IndexedSeq(
    "red", "green", "blue", "yellow", "orange", "purple", "pink", "brown",
    "black", "white", "gray", "cyan", "magenta", "lime", "navy", "teal",
    "maroon", "olive", "silver", "gold")

  // ------------------------------------------------------------- locales

  /** Per-locale first/last-name and city lists (common public-knowledge
    * names; the reference delegates locales to the Python faker package —
    * text_generator_plugins.py:315-436 — which this zero-egress build
    * replaces with bundled lists). Unlisted locales fall back to "en". */
  private val LocaleFirstNames: Map[String, IndexedSeq[String]] = Map(
    "de" -> IndexedSeq(
      "hans", "anna", "peter", "maria", "thomas", "ursula", "michael", "monika",
      "wolfgang", "petra", "klaus", "sabine", "jürgen", "renate", "dieter",
      "karin", "stefan", "claudia", "andreas", "brigitte", "frank", "heike",
      "uwe", "gabriele", "lukas", "lena", "felix", "emma", "jonas", "mia",
      "maximilian", "sophie", "leon", "hannah", "paul", "laura").map(_.capitalize),
    "fr" -> IndexedSeq(
      "jean", "marie", "pierre", "françoise", "michel", "monique", "andré",
      "catherine", "philippe", "nathalie", "alain", "isabelle", "jacques",
      "sylvie", "bernard", "martine", "claude", "nicole", "daniel", "sophie",
      "louis", "camille", "hugo", "léa", "lucas", "chloé", "gabriel", "manon",
      "arthur", "inès", "jules", "julie", "théo", "sarah").map(_.capitalize),
    "es" -> IndexedSeq(
      "josé", "maría", "antonio", "carmen", "manuel", "ana", "francisco",
      "isabel", "juan", "dolores", "david", "pilar", "javier", "teresa",
      "miguel", "rosa", "carlos", "lucía", "daniel", "elena", "pablo", "marta",
      "alejandro", "sara", "diego", "paula", "sergio", "laura", "pedro",
      "cristina", "álvaro", "raquel").map(_.capitalize),
    "it" -> IndexedSeq(
      "giuseppe", "maria", "giovanni", "anna", "antonio", "giulia", "mario",
      "francesca", "luigi", "chiara", "francesco", "paola", "angelo", "laura",
      "vincenzo", "martina", "pietro", "alessia", "salvatore", "sofia",
      "carlo", "elena", "franco", "valentina", "domenico", "sara", "bruno",
      "alessandra", "paolo", "federica").map(_.capitalize),
    "pt" -> IndexedSeq(
      "joão", "maria", "josé", "ana", "antónio", "beatriz", "manuel", "inês",
      "francisco", "mariana", "pedro", "catarina", "carlos", "sofia", "luís",
      "margarida", "miguel", "joana", "rui", "teresa", "paulo", "leonor",
      "andré", "carolina", "tiago", "matilde", "bruno", "rita", "diogo",
      "lara").map(_.capitalize),
    "nl" -> IndexedSeq(
      "jan", "maria", "willem", "anna", "hendrik", "johanna", "pieter",
      "elisabeth", "cornelis", "sophie", "johannes", "emma", "daan", "julia",
      "sem", "mila", "lucas", "tess", "finn", "sara", "lars", "eva", "thijs",
      "lotte", "bram", "fleur", "ruben", "noor", "timo", "lieke").map(_.capitalize),
    "pl" -> IndexedSeq(
      "jan", "anna", "piotr", "maria", "krzysztof", "katarzyna", "andrzej",
      "małgorzata", "tomasz", "agnieszka", "paweł", "barbara", "marcin",
      "ewa", "michał", "magdalena", "marek", "joanna", "grzegorz", "monika",
      "adam", "danuta", "łukasz", "natalia", "jakub", "zofia", "mateusz",
      "aleksandra", "wojciech", "julia").map(_.capitalize),
    "sv" -> IndexedSeq(
      "lars", "anna", "karl", "eva", "erik", "maria", "anders", "karin",
      "johan", "sara", "per", "lena", "nils", "emma", "mikael", "kerstin",
      "gustav", "ingrid", "fredrik", "elin", "magnus", "astrid", "oskar",
      "linnea", "axel", "sofia", "henrik", "ebba", "viktor", "alva").map(_.capitalize),
    "ja" -> IndexedSeq(
      "haruto", "yui", "sota", "aoi", "yuto", "hina", "ren", "sakura",
      "hayato", "mio", "takumi", "rin", "kaito", "koharu", "riku", "mei",
      "daiki", "yuna", "kenta", "saki", "shota", "ayaka", "naoki", "misaki",
      "ryota", "nanami", "kazuki", "honoka", "tatsuya", "akari").map(_.capitalize))

  private val LocaleLastNames: Map[String, IndexedSeq[String]] = Map(
    "de" -> IndexedSeq(
      "müller", "schmidt", "schneider", "fischer", "weber", "meyer", "wagner",
      "becker", "schulz", "hoffmann", "schäfer", "koch", "bauer", "richter",
      "klein", "wolf", "schröder", "neumann", "schwarz", "zimmermann", "braun",
      "krüger", "hofmann", "hartmann", "lange", "schmitt", "werner", "krause",
      "meier", "lehmann").map(_.capitalize),
    "fr" -> IndexedSeq(
      "martin", "bernard", "dubois", "thomas", "robert", "richard", "petit",
      "durand", "leroy", "moreau", "simon", "laurent", "lefebvre", "michel",
      "garcia", "david", "bertrand", "roux", "vincent", "fournier", "morel",
      "girard", "andré", "mercier", "dupont", "lambert", "bonnet", "françois",
      "martinez", "legrand").map(_.capitalize),
    "es" -> IndexedSeq(
      "garcía", "rodríguez", "gonzález", "fernández", "lópez", "martínez",
      "sánchez", "pérez", "gómez", "martín", "jiménez", "ruiz", "hernández",
      "díaz", "moreno", "muñoz", "álvarez", "romero", "alonso", "gutiérrez",
      "navarro", "torres", "domínguez", "vázquez", "ramos", "gil", "ramírez",
      "serrano", "blanco", "molina").map(_.capitalize),
    "it" -> IndexedSeq(
      "rossi", "russo", "ferrari", "esposito", "bianchi", "romano", "colombo",
      "ricci", "marino", "greco", "bruno", "gallo", "conti", "de luca",
      "mancini", "costa", "giordano", "rizzo", "lombardi", "moretti",
      "barbieri", "fontana", "santoro", "mariani", "rinaldi", "caruso",
      "ferrara", "galli", "martini", "leone").map(_.capitalize),
    "pt" -> IndexedSeq(
      "silva", "santos", "ferreira", "pereira", "oliveira", "costa",
      "rodrigues", "martins", "jesus", "sousa", "fernandes", "gonçalves",
      "gomes", "lopes", "marques", "alves", "almeida", "ribeiro", "pinto",
      "carvalho", "teixeira", "moreira", "correia", "mendes", "nunes",
      "soares", "vieira", "monteiro", "cardoso", "rocha").map(_.capitalize),
    "nl" -> IndexedSeq(
      "de jong", "jansen", "de vries", "van den berg", "van dijk", "bakker",
      "janssen", "visser", "smit", "meijer", "de boer", "mulder", "de groot",
      "bos", "vos", "peters", "hendriks", "van leeuwen", "dekker", "brouwer",
      "de wit", "dijkstra", "smits", "de graaf", "van der meer", "kok",
      "jacobs", "vermeulen", "van den heuvel", "van der veen").map(_.capitalize),
    "pl" -> IndexedSeq(
      "nowak", "kowalski", "wiśniewski", "wójcik", "kowalczyk", "kamiński",
      "lewandowski", "zieliński", "szymański", "woźniak", "dąbrowski",
      "kozłowski", "jankowski", "mazur", "kwiatkowski", "krawczyk", "piotrowski",
      "grabowski", "nowakowski", "pawłowski", "michalski", "nowicki",
      "adamczyk", "dudek", "zając", "wieczorek", "jabłoński", "król",
      "majewski", "olszewski").map(_.capitalize),
    "sv" -> IndexedSeq(
      "andersson", "johansson", "karlsson", "nilsson", "eriksson", "larsson",
      "olsson", "persson", "svensson", "gustafsson", "pettersson", "jonsson",
      "jansson", "hansson", "bengtsson", "jönsson", "lindberg", "jakobsson",
      "magnusson", "olofsson", "lindström", "lindqvist", "lindgren", "berg",
      "axelsson", "bergström", "lundberg", "lind", "lundgren", "lundqvist")
      .map(_.capitalize),
    "ja" -> IndexedSeq(
      "sato", "suzuki", "takahashi", "tanaka", "watanabe", "ito", "yamamoto",
      "nakamura", "kobayashi", "kato", "yoshida", "yamada", "sasaki",
      "yamaguchi", "saito", "matsumoto", "inoue", "kimura", "hayashi",
      "shimizu", "yamazaki", "mori", "abe", "ikeda", "hashimoto", "yamashita",
      "ishikawa", "nakajima", "maeda", "fujita").map(_.capitalize))

  private val LocaleCities: Map[String, IndexedSeq[String]] = Map(
    "de" -> IndexedSeq(
      "Berlin", "Hamburg", "München", "Köln", "Frankfurt", "Stuttgart",
      "Düsseldorf", "Leipzig", "Dortmund", "Essen", "Bremen", "Dresden",
      "Hannover", "Nürnberg", "Duisburg", "Bochum", "Wuppertal", "Bielefeld",
      "Bonn", "Münster"),
    "fr" -> IndexedSeq(
      "Paris", "Marseille", "Lyon", "Toulouse", "Nice", "Nantes", "Montpellier",
      "Strasbourg", "Bordeaux", "Lille", "Rennes", "Reims", "Toulon",
      "Saint-Étienne", "Le Havre", "Grenoble", "Dijon", "Angers", "Nîmes",
      "Villeurbanne"),
    "es" -> IndexedSeq(
      "Madrid", "Barcelona", "Valencia", "Sevilla", "Zaragoza", "Málaga",
      "Murcia", "Palma", "Bilbao", "Alicante", "Córdoba", "Valladolid",
      "Vigo", "Gijón", "Granada", "Elche", "Oviedo", "Badalona", "Cartagena",
      "Terrassa"),
    "it" -> IndexedSeq(
      "Roma", "Milano", "Napoli", "Torino", "Palermo", "Genova", "Bologna",
      "Firenze", "Bari", "Catania", "Venezia", "Verona", "Messina", "Padova",
      "Trieste", "Brescia", "Parma", "Taranto", "Prato", "Modena"),
    "pt" -> IndexedSeq(
      "Lisboa", "Porto", "Amadora", "Braga", "Setúbal", "Coimbra", "Queluz",
      "Funchal", "Cacém", "Vila Nova de Gaia", "Loures", "Évora", "Rio Tinto",
      "Odivelas", "Aveiro", "Amora", "Corroios", "Barreiro", "Guimarães",
      "Faro"),
    "nl" -> IndexedSeq(
      "Amsterdam", "Rotterdam", "Den Haag", "Utrecht", "Eindhoven", "Tilburg",
      "Groningen", "Almere", "Breda", "Nijmegen", "Enschede", "Haarlem",
      "Arnhem", "Zaanstad", "Amersfoort", "Apeldoorn", "Hoofddorp",
      "Maastricht", "Leiden", "Dordrecht"),
    "pl" -> IndexedSeq(
      "Warszawa", "Kraków", "Łódź", "Wrocław", "Poznań", "Gdańsk", "Szczecin",
      "Bydgoszcz", "Lublin", "Białystok", "Katowice", "Gdynia", "Częstochowa",
      "Radom", "Sosnowiec", "Toruń", "Kielce", "Rzeszów", "Gliwice", "Zabrze"),
    "sv" -> IndexedSeq(
      "Stockholm", "Göteborg", "Malmö", "Uppsala", "Västerås", "Örebro",
      "Linköping", "Helsingborg", "Jönköping", "Norrköping", "Lund", "Umeå",
      "Gävle", "Borås", "Södertälje", "Eskilstuna", "Halmstad", "Växjö",
      "Karlstad", "Sundsvall"),
    "ja" -> IndexedSeq(
      "Tokyo", "Yokohama", "Osaka", "Nagoya", "Sapporo", "Fukuoka", "Kobe",
      "Kawasaki", "Kyoto", "Saitama", "Hiroshima", "Sendai", "Chiba",
      "Kitakyushu", "Sakai", "Niigata", "Hamamatsu", "Kumamoto", "Sagamihara",
      "Okayama"))

  /** Supported locales (others fall back to "en"). */
  val Locales: Set[String] = Set("en") ++ LocaleFirstNames.keySet

  /** Deterministic pool of `size` values for `provider` in `locale`. */
  def pool(provider: String, size: Int, globalSeed: Long, locale: String = "en"): Seq[String] = {
    require(size > 0 && size <= 10000, s"faker pool size must be 1..10000, got $size")
    val loc = locale.take(2).toLowerCase
    val first = LocaleFirstNames.getOrElse(loc, FirstNames)
    val last = LocaleLastNames.getOrElse(loc, LastNames)
    val cities = LocaleCities.getOrElse(loc, Cities)
    val rnd = new java.util.Random(globalSeed * 31L + provider.hashCode * 7L + loc.hashCode)
    def pick[T](xs: IndexedSeq[T]): T = xs(rnd.nextInt(xs.length))
    def ascii(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("[^\\p{ASCII}]", "")
    (0 until size).map { _ =>
      provider match {
        case "first_name" => pick(first)
        case "last_name" => pick(last)
        case "name" => s"${pick(first)} ${pick(last)}"
        case "email" =>
          s"${ascii(pick(first)).toLowerCase}.${ascii(pick(last)).toLowerCase}${rnd.nextInt(100)}@${pick(EmailDomains)}"
        case "company" => s"${pick(CompanyWords)} ${pick(CompanyWords)} ${pick(CompanySuffixes)}"
        case "city" => pick(cities)
        case "country" => pick(Countries)
        case "street_address" => s"${1 + rnd.nextInt(9999)} ${pick(last)} ${pick(StreetSuffixes)}"
        case "phone_number" => f"${200 + rnd.nextInt(800)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d"
        case "word" => ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length))
        case "state" => pick(States)
        case "postcode" => f"${rnd.nextInt(100000)}%05d"
        case "job" => pick(Jobs)
        case "color" => pick(Colors)
        case "domain_name" => pick(EmailDomains)
        case "user_name" =>
          s"${ascii(pick(first)).toLowerCase}${if (rnd.nextBoolean()) "." else "_"}${ascii(pick(last)).toLowerCase}${rnd.nextInt(100)}"
        case "url" =>
          s"https://www.${pick(EmailDomains)}/${ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length))}"
        case "ipv4" => s"${1 + rnd.nextInt(223)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"
        case other => throw SpecError(s"unknown faker provider '$other'; supported: first_name, " +
          "last_name, name, email, company, city, country, street_address, phone_number, word, " +
          "state, postcode, job, color, domain_name, user_name, url, ipv4")
      }
    }
  }
}
