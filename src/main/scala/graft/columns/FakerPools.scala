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

  /** ISO 3166-1 alpha-2 codes (common subset). */
  private val CountryCodes: IndexedSeq[String] = IndexedSeq(
    "US", "GB", "DE", "FR", "ES", "IT", "PT", "NL", "BE", "CH", "AT", "PL",
    "SE", "NO", "DK", "FI", "IE", "CZ", "SK", "HU", "RO", "BG", "GR", "TR",
    "RU", "UA", "CN", "JP", "KR", "IN", "ID", "TH", "VN", "PH", "MY", "SG",
    "AU", "NZ", "CA", "MX", "BR", "AR", "CL", "CO", "PE", "ZA", "EG", "NG",
    "KE", "MA", "SA", "AE", "IL", "QA", "KW")

  /** ISO 4217 currency codes (common subset). */
  private val CurrencyCodes: IndexedSeq[String] = IndexedSeq(
    "USD", "EUR", "GBP", "JPY", "CHF", "CAD", "AUD", "NZD", "SEK", "NOK",
    "DKK", "PLN", "CZK", "HUF", "RON", "BGN", "TRY", "RUB", "UAH", "CNY",
    "HKD", "TWD", "KRW", "INR", "IDR", "THB", "VND", "PHP", "MYR", "SGD",
    "MXN", "BRL", "ARS", "CLP", "COP", "PEN", "ZAR", "EGP", "NGN", "KES",
    "MAD", "SAR", "AED", "ILS", "QAR", "KWD")

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
      "ryota", "nanami", "kazuki", "honoka", "tatsuya", "akari").map(_.capitalize),
    // Locales below ship romanized forms where the native script would
    // otherwise be stripped to nothing by the email/user_name ASCII fold
    // (python-faker emits native script; documented divergence).
    "ru" -> IndexedSeq(
      "Ivan", "Dmitri", "Sergei", "Alexei", "Andrei", "Mikhail", "Vladimir",
      "Nikolai", "Pavel", "Yuri", "Oleg", "Viktor", "Anton", "Boris", "Maxim",
      "Anna", "Olga", "Elena", "Natalia", "Tatiana", "Irina", "Svetlana",
      "Ekaterina", "Maria", "Anastasia", "Yulia", "Vera", "Galina", "Larisa",
      "Nadezhda"),
    "uk" -> IndexedSeq(
      "Oleksandr", "Serhii", "Andrii", "Volodymyr", "Mykola", "Ivan", "Vasyl",
      "Oleh", "Taras", "Bohdan", "Petro", "Dmytro", "Yurii", "Viktor",
      "Maksym", "Olena", "Oksana", "Iryna", "Tetiana", "Nataliia", "Kateryna",
      "Svitlana", "Hanna", "Mariia", "Yuliia", "Olha", "Liudmyla", "Halyna",
      "Valentyna", "Nadiia"),
    "cs" -> IndexedSeq(
      "Jiří", "Jan", "Petr", "Josef", "Pavel", "Martin", "Tomáš", "Jaroslav",
      "Miroslav", "Zdeněk", "František", "Václav", "Michal", "Milan", "Karel",
      "Jana", "Marie", "Eva", "Hana", "Anna", "Lenka", "Kateřina", "Lucie",
      "Věra", "Alena", "Petra", "Veronika", "Jaroslava", "Tereza", "Martina"),
    "da" -> IndexedSeq(
      "Jens", "Peter", "Lars", "Michael", "Henrik", "Thomas", "Søren", "Jan",
      "Christian", "Martin", "Niels", "Anders", "Morten", "Jesper", "Hans",
      "Anne", "Kirsten", "Mette", "Hanne", "Helle", "Anna", "Susanne", "Lene",
      "Maria", "Marianne", "Camilla", "Pia", "Louise", "Charlotte", "Bente"),
    "fi" -> IndexedSeq(
      "Juhani", "Mikko", "Antti", "Jari", "Pekka", "Timo", "Matti", "Kari",
      "Jukka", "Markku", "Hannu", "Heikki", "Seppo", "Ville", "Janne",
      "Maria", "Helena", "Anneli", "Johanna", "Kaarina", "Hannele", "Liisa",
      "Anna", "Leena", "Marjatta", "Tuula", "Ritva", "Pirjo", "Sari", "Minna"),
    "no" -> IndexedSeq(
      "Jan", "Per", "Bjørn", "Ole", "Lars", "Kjell", "Knut", "Svein", "Arne",
      "Thomas", "Geir", "Hans", "Odd", "Tor", "Morten", "Anne", "Inger",
      "Kari", "Marit", "Ingrid", "Liv", "Eva", "Berit", "Astrid", "Bjørg",
      "Hilde", "Anna", "Solveig", "Marianne", "Randi"),
    "hu" -> IndexedSeq(
      "László", "István", "József", "János", "Zoltán", "Sándor", "Gábor",
      "Ferenc", "Attila", "Péter", "Tamás", "Zsolt", "Tibor", "András",
      "Csaba", "Mária", "Erzsébet", "Katalin", "Éva", "Ilona", "Anna",
      "Zsuzsanna", "Margit", "Judit", "Ágnes", "Andrea", "Ildikó", "Erika",
      "Krisztina", "Edit"),
    "ro" -> IndexedSeq(
      "Ion", "Gheorghe", "Vasile", "Nicolae", "Mihai", "Constantin",
      "Alexandru", "Dumitru", "Andrei", "Adrian", "Stefan", "Cristian",
      "Florin", "Marian", "Daniel", "Maria", "Elena", "Ana", "Ioana",
      "Andreea", "Mihaela", "Cristina", "Gabriela", "Daniela", "Alexandra",
      "Monica", "Simona", "Laura", "Carmen", "Raluca"),
    "tr" -> IndexedSeq(
      "Mehmet", "Mustafa", "Ahmet", "Ali", "Hüseyin", "Hasan", "İbrahim",
      "Osman", "Yusuf", "Murat", "Ömer", "Ramazan", "Halil", "Süleyman",
      "Emre", "Fatma", "Ayşe", "Emine", "Hatice", "Zeynep", "Elif", "Meryem",
      "Şerife", "Zehra", "Sultan", "Hanife", "Merve", "Havva", "Esra",
      "Fadime"),
    "el" -> IndexedSeq(
      "Georgios", "Dimitrios", "Konstantinos", "Ioannis", "Nikolaos",
      "Panagiotis", "Vasileios", "Christos", "Athanasios", "Michail",
      "Evangelos", "Spyridon", "Andreas", "Theodoros", "Petros", "Maria",
      "Eleni", "Aikaterini", "Vasiliki", "Sophia", "Angeliki", "Georgia",
      "Dimitra", "Konstantina", "Paraskevi", "Anastasia", "Evangelia",
      "Ioanna", "Despoina", "Panagiota"),
    "zh" -> IndexedSeq(
      "Wei", "Fang", "Min", "Jing", "Li", "Qiang", "Lei", "Jun", "Yang",
      "Yong", "Yan", "Jie", "Juan", "Tao", "Ming", "Chao", "Xin", "Hui",
      "Ying", "Ping", "Gang", "Hua", "Mei", "Na", "Xia", "Bo", "Peng",
      "Hao", "Yu", "Lin"),
    "ko" -> IndexedSeq(
      "Minjun", "Seojun", "Dohyun", "Jiho", "Joon", "Siwoo", "Jihoon",
      "Sungmin", "Hyunwoo", "Jinwoo", "Taeyang", "Minseok", "Jaehyun",
      "Woojin", "Hajun", "Seoyeon", "Jiwoo", "Minseo", "Hayoon", "Jiyoo",
      "Soyeon", "Yuna", "Chaewon", "Jieun", "Sumin", "Eunseo", "Hyejin",
      "Yejin", "Dain", "Haeun"),
    "ar" -> IndexedSeq(
      "Mohammed", "Ahmed", "Ali", "Omar", "Youssef", "Khaled", "Hassan",
      "Hussein", "Ibrahim", "Abdullah", "Mahmoud", "Mustafa", "Tariq",
      "Karim", "Samir", "Fatima", "Aisha", "Mariam", "Zainab", "Layla",
      "Noor", "Huda", "Amira", "Salma", "Rania", "Yasmin", "Dalia", "Hana",
      "Nadia", "Samira"))

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
      "ishikawa", "nakajima", "maeda", "fujita").map(_.capitalize),
    "ru" -> IndexedSeq(
      "Ivanov", "Smirnov", "Kuznetsov", "Popov", "Vasiliev", "Petrov",
      "Sokolov", "Mikhailov", "Novikov", "Fedorov", "Morozov", "Volkov",
      "Alekseev", "Lebedev", "Semenov", "Egorov", "Pavlov", "Kozlov",
      "Stepanov", "Nikolaev", "Orlov", "Andreev", "Makarov", "Nikitin",
      "Zakharov", "Zaitsev", "Soloviev", "Borisov", "Yakovlev", "Grigoriev"),
    "uk" -> IndexedSeq(
      "Shevchenko", "Bondarenko", "Kovalenko", "Boiko", "Tkachenko",
      "Kravchenko", "Kovalchuk", "Koval", "Oliinyk", "Shevchuk",
      "Polishchuk", "Bondar", "Tkachuk", "Moroz", "Marchenko", "Lysenko",
      "Rudenko", "Savchenko", "Petrenko", "Kharchenko", "Melnyk",
      "Pavlenko", "Kravets", "Klymenko", "Ponomarenko", "Savchuk",
      "Khomenko", "Vasylenko", "Romanenko", "Honcharenko"),
    "cs" -> IndexedSeq(
      "Novák", "Svoboda", "Novotný", "Dvořák", "Černý", "Procházka",
      "Kučera", "Veselý", "Horák", "Němec", "Marek", "Pospíšil", "Pokorný",
      "Hájek", "Král", "Jelínek", "Růžička", "Beneš", "Fiala", "Sedláček",
      "Doležal", "Zeman", "Kolář", "Navrátil", "Čermák", "Vaněk", "Urban",
      "Blažek", "Kříž", "Kovář"),
    "da" -> IndexedSeq(
      "Nielsen", "Jensen", "Hansen", "Pedersen", "Andersen", "Christensen",
      "Larsen", "Sørensen", "Rasmussen", "Jørgensen", "Petersen", "Madsen",
      "Kristensen", "Olsen", "Thomsen", "Christiansen", "Poulsen",
      "Johansen", "Møller", "Mortensen", "Knudsen", "Jakobsen", "Jacobsen",
      "Olesen", "Frederiksen", "Mikkelsen", "Henriksen", "Laursen", "Lund",
      "Schmidt"),
    "fi" -> IndexedSeq(
      "Korhonen", "Virtanen", "Mäkinen", "Nieminen", "Mäkelä", "Hämäläinen",
      "Laine", "Heikkinen", "Koskinen", "Järvinen", "Lehtonen", "Lehtinen",
      "Saarinen", "Salminen", "Heinonen", "Niemi", "Heikkilä", "Kinnunen",
      "Salonen", "Turunen", "Salo", "Laitinen", "Tuominen", "Rantanen",
      "Karjalainen", "Jokinen", "Mattila", "Savolainen", "Lahtinen",
      "Ahonen"),
    "no" -> IndexedSeq(
      "Hansen", "Johansen", "Olsen", "Larsen", "Andersen", "Pedersen",
      "Nilsen", "Kristiansen", "Jensen", "Karlsen", "Johnsen", "Pettersen",
      "Eriksen", "Berg", "Haugen", "Hagen", "Johannessen", "Andreassen",
      "Jacobsen", "Dahl", "Jørgensen", "Halvorsen", "Henriksen", "Lund",
      "Sørensen", "Jakobsen", "Moen", "Gundersen", "Iversen", "Strand"),
    "hu" -> IndexedSeq(
      "Nagy", "Kovács", "Tóth", "Szabó", "Horváth", "Varga", "Kiss",
      "Molnár", "Németh", "Farkas", "Balogh", "Papp", "Takács", "Juhász",
      "Lakatos", "Mészáros", "Oláh", "Simon", "Rácz", "Fekete", "Szilágyi",
      "Török", "Fehér", "Balázs", "Gál", "Kis", "Szűcs", "Kocsis", "Orsós",
      "Pintér"),
    "ro" -> IndexedSeq(
      "Popescu", "Ionescu", "Popa", "Radu", "Dumitru", "Stan", "Stoica",
      "Gheorghe", "Matei", "Ciobanu", "Rusu", "Munteanu", "Constantin",
      "Marin", "Lazar", "Mihai", "Florea", "Barbu", "Nistor", "Dinu",
      "Vasile", "Tudor", "Dobre", "Ilie", "Neagu", "Oprea", "Preda",
      "Sandu", "Serban", "Toma"),
    "tr" -> IndexedSeq(
      "Yılmaz", "Kaya", "Demir", "Çelik", "Şahin", "Yıldız", "Yıldırım",
      "Öztürk", "Aydın", "Özdemir", "Arslan", "Doğan", "Kılıç", "Aslan",
      "Çetin", "Kara", "Koç", "Kurt", "Özkan", "Şimşek", "Polat", "Korkmaz",
      "Özcan", "Çakır", "Erdoğan", "Yavuz", "Sarı", "Güneş", "Akın",
      "Kaplan"),
    "el" -> IndexedSeq(
      "Papadopoulos", "Papadakis", "Oikonomou", "Georgiou", "Dimitriou",
      "Papageorgiou", "Vasileiou", "Nikolaou", "Ioannidis", "Antoniou",
      "Konstantinidis", "Makris", "Papanikolaou", "Vlachos", "Karagiannis",
      "Alexiou", "Christodoulou", "Stavrou", "Anagnostou", "Angelopoulos",
      "Panagiotopoulos", "Spanos", "Raptis", "Lambrou", "Athanasiou",
      "Samaras", "Sideris", "Kontos", "Tsakiris", "Doukas"),
    "zh" -> IndexedSeq(
      "Wang", "Li", "Zhang", "Liu", "Chen", "Yang", "Huang", "Zhao", "Wu",
      "Zhou", "Xu", "Sun", "Ma", "Zhu", "Hu", "Guo", "He", "Lin", "Gao",
      "Luo", "Zheng", "Liang", "Xie", "Song", "Tang", "Deng", "Han",
      "Feng", "Cao", "Peng"),
    "ko" -> IndexedSeq(
      "Kim", "Lee", "Park", "Choi", "Jung", "Kang", "Cho", "Yoon", "Jang",
      "Lim", "Han", "Oh", "Seo", "Shin", "Kwon", "Hwang", "Ahn", "Song",
      "Yoo", "Hong", "Jeon", "Ko", "Moon", "Yang", "Son", "Bae", "Baek",
      "Heo", "Nam", "Roh"),
    "ar" -> IndexedSeq(
      "Hassan", "Ibrahim", "Khalil", "Haddad", "Nasser", "Saleh", "Rahman",
      "Aziz", "Hamdan", "Mansour", "Qasim", "Farah", "Najjar", "Khoury",
      "Sabbagh", "Shadid", "Bishara", "Ganem", "Maalouf", "Tahan", "Antar",
      "Asfour", "Bitar", "Dagher", "Fakhoury", "Gerges", "Kassab", "Nader",
      "Rizk", "Sarkis"))

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
      "Okayama"),
    "ru" -> IndexedSeq(
      "Moscow", "Saint Petersburg", "Novosibirsk", "Yekaterinburg", "Kazan",
      "Nizhny Novgorod", "Chelyabinsk", "Samara", "Omsk", "Rostov-on-Don",
      "Ufa", "Krasnoyarsk", "Voronezh", "Perm", "Volgograd", "Krasnodar",
      "Saratov", "Tyumen", "Tolyatti", "Izhevsk"),
    "uk" -> IndexedSeq(
      "Kyiv", "Kharkiv", "Odesa", "Dnipro", "Donetsk", "Zaporizhzhia",
      "Lviv", "Kryvyi Rih", "Mykolaiv", "Mariupol", "Luhansk", "Vinnytsia",
      "Makiivka", "Sevastopol", "Simferopol", "Kherson", "Poltava",
      "Chernihiv", "Cherkasy", "Zhytomyr"),
    "cs" -> IndexedSeq(
      "Praha", "Brno", "Ostrava", "Plzeň", "Liberec", "Olomouc",
      "České Budějovice", "Hradec Králové", "Ústí nad Labem", "Pardubice",
      "Zlín", "Havířov", "Kladno", "Most", "Opava", "Frýdek-Místek",
      "Karviná", "Jihlava", "Teplice", "Děčín"),
    "da" -> IndexedSeq(
      "København", "Aarhus", "Odense", "Aalborg", "Esbjerg", "Randers",
      "Kolding", "Horsens", "Vejle", "Roskilde", "Herning", "Silkeborg",
      "Næstved", "Fredericia", "Viborg", "Køge", "Holstebro", "Taastrup",
      "Slagelse", "Hillerød"),
    "fi" -> IndexedSeq(
      "Helsinki", "Espoo", "Tampere", "Vantaa", "Oulu", "Turku",
      "Jyväskylä", "Lahti", "Kuopio", "Pori", "Kouvola", "Joensuu",
      "Lappeenranta", "Hämeenlinna", "Vaasa", "Seinäjoki", "Rovaniemi",
      "Mikkeli", "Kotka", "Salo"),
    "no" -> IndexedSeq(
      "Oslo", "Bergen", "Trondheim", "Stavanger", "Drammen", "Fredrikstad",
      "Kristiansand", "Sandnes", "Tromsø", "Sarpsborg", "Skien", "Ålesund",
      "Sandefjord", "Haugesund", "Tønsberg", "Moss", "Porsgrunn", "Bodø",
      "Arendal", "Hamar"),
    "hu" -> IndexedSeq(
      "Budapest", "Debrecen", "Szeged", "Miskolc", "Pécs", "Győr",
      "Nyíregyháza", "Kecskemét", "Székesfehérvár", "Szombathely",
      "Szolnok", "Tatabánya", "Kaposvár", "Érd", "Veszprém", "Békéscsaba",
      "Zalaegerszeg", "Sopron", "Eger", "Nagykanizsa"),
    "ro" -> IndexedSeq(
      "București", "Cluj-Napoca", "Timișoara", "Iași", "Constanța",
      "Craiova", "Brașov", "Galați", "Ploiești", "Oradea", "Brăila",
      "Arad", "Pitești", "Sibiu", "Bacău", "Târgu Mureș", "Baia Mare",
      "Buzău", "Botoșani", "Satu Mare"),
    "tr" -> IndexedSeq(
      "İstanbul", "Ankara", "İzmir", "Bursa", "Adana", "Gaziantep", "Konya",
      "Antalya", "Kayseri", "Mersin", "Eskişehir", "Diyarbakır", "Samsun",
      "Denizli", "Şanlıurfa", "Malatya", "Kahramanmaraş", "Erzurum", "Van",
      "Batman"),
    "el" -> IndexedSeq(
      "Athens", "Thessaloniki", "Patras", "Piraeus", "Larissa", "Heraklion",
      "Peristeri", "Kallithea", "Acharnes", "Kalamaria", "Nikaia",
      "Glyfada", "Volos", "Ilio", "Ilioupoli", "Keratsini", "Evosmos",
      "Chalandri", "Nea Smyrni", "Marousi"),
    "zh" -> IndexedSeq(
      "Beijing", "Shanghai", "Guangzhou", "Shenzhen", "Chengdu",
      "Chongqing", "Tianjin", "Wuhan", "Xian", "Hangzhou", "Nanjing",
      "Shenyang", "Harbin", "Suzhou", "Qingdao", "Dalian", "Zhengzhou",
      "Changsha", "Kunming", "Jinan"),
    "ko" -> IndexedSeq(
      "Seoul", "Busan", "Incheon", "Daegu", "Daejeon", "Gwangju", "Suwon",
      "Ulsan", "Changwon", "Goyang", "Yongin", "Seongnam", "Bucheon",
      "Cheongju", "Ansan", "Jeonju", "Anyang", "Cheonan", "Pohang",
      "Uijeongbu"),
    "ar" -> IndexedSeq(
      "Cairo", "Riyadh", "Baghdad", "Jeddah", "Amman", "Beirut", "Damascus",
      "Dubai", "Abu Dhabi", "Doha", "Kuwait City", "Casablanca",
      "Alexandria", "Algiers", "Tunis", "Tripoli", "Khartoum", "Sanaa",
      "Muscat", "Manama"))

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
    /** Email/user_name local parts: diacritics folded, then anything
      * outside [a-z0-9] dropped (multi-word surnames like "de jong" or
      * "van den berg" must not leak spaces into addresses). */
    def emailSafe(s: String): String = {
      val folded = ascii(s).toLowerCase.replaceAll("[^a-z0-9]", "")
      if (folded.isEmpty) "x" else folded
    }
    (0 until size).map { _ =>
      provider match {
        case "first_name" => pick(first)
        case "last_name" => pick(last)
        case "name" => s"${pick(first)} ${pick(last)}"
        case "email" =>
          s"${emailSafe(pick(first))}.${emailSafe(pick(last))}${rnd.nextInt(100)}@${pick(EmailDomains)}"
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
          s"${emailSafe(pick(first))}${if (rnd.nextBoolean()) "." else "_"}${emailSafe(pick(last))}${rnd.nextInt(100)}"
        case "url" =>
          s"https://www.${pick(EmailDomains)}/${ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length))}"
        case "ipv4" => s"${1 + rnd.nextInt(223)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"
        case "ipv6" => (0 until 8).map(_ => f"${rnd.nextInt(0x10000)}%04x").mkString(":")
        case "mac_address" => (0 until 6).map(_ => f"${rnd.nextInt(256)}%02x").mkString(":")
        case "uuid4" =>
          // RFC 4122 v4 layout from the seeded stream (version/variant bits
          // forced), rendered by java.util.UUID.
          val msb = (rnd.nextLong() & ~0xF000L) | 0x4000L
          val lsb = (rnd.nextLong() & ~(0xC000000000000000L)) | 0x8000000000000000L
          new java.util.UUID(msb, lsb).toString
        case "country_code" => pick(CountryCodes)
        case "currency_code" => pick(CurrencyCodes)
        case "latitude" => f"${rnd.nextDouble() * 180.0 - 90.0}%.6f"
        case "longitude" => f"${rnd.nextDouble() * 360.0 - 180.0}%.6f"
        case "ssn" => f"${100 + rnd.nextInt(800)}%03d-${10 + rnd.nextInt(90)}%02d-${1000 + rnd.nextInt(9000)}%04d"
        case "date_of_birth" =>
          java.time.LocalDate.of(1950, 1, 1).plusDays(rnd.nextInt(20089).toLong).toString
        case "credit_card_number" =>
          // 16-digit Visa-style PAN with a valid Luhn check digit.
          val digits = 4 +: (0 until 14).map(_ => rnd.nextInt(10))
          digits.mkString + luhnCheckDigit(digits)
        case "sentence" =>
          val words = (0 until 6 + rnd.nextInt(7))
            .map(_ => ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length)))
          words.head.capitalize + words.tail.mkString(" ", " ", "") + "."
        case "paragraph" =>
          (0 until 3 + rnd.nextInt(3)).map { _ =>
            val words = (0 until 6 + rnd.nextInt(7))
              .map(_ => ILTextCompiler.LoremWords(rnd.nextInt(ILTextCompiler.LoremWords.length)))
            words.head.capitalize + words.tail.mkString(" ", " ", "") + "."
          }.mkString(" ")
        case other => throw SpecError(s"unknown faker provider '$other'; supported: first_name, " +
          "last_name, name, email, company, city, country, street_address, phone_number, word, " +
          "state, postcode, job, color, domain_name, user_name, url, ipv4, ipv6, mac_address, " +
          "uuid4, country_code, currency_code, latitude, longitude, ssn, date_of_birth, " +
          "credit_card_number, sentence, paragraph")
      }
    }
  }

  /** Luhn check digit for the given payload digits (payload excludes the
    * check digit itself). */
  private[graft] def luhnCheckDigit(payload: Seq[Int]): Int = {
    // Walking right-to-left over payload+check, payload positions alternate
    // starting at double for the digit immediately left of the check digit.
    val sum = payload.reverse.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 0) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    (10 - sum % 10) % 10
  }
}
