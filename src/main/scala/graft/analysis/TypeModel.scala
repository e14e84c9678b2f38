package graft.analysis

/** NER-tag type scoring — the stand-in for the reference's fastText type
  * model (`/root/reference/ingestors/analysis/ft_type_model.py`): values
  * are normalized (lowercase + latinize) exactly like `_clean_input`, a
  * deterministic feature scorer replaces the learned embedding, and the
  * confidence uses the reference's exact entropy formula
  * (`ft_type_model.py:23`): confidence = 1 + Σ p·ln(p) / ln(1/n). */
object TypeModel {

  val labels: Vector[String] = Vector("person", "company", "trash")
  private val maxEntropy = math.log(labels.length.toDouble)

  private val legalForms = Set(
    "ltd", "llc", "inc", "gmbh", "corp", "co", "plc", "sa", "ag", "bv",
    "oy", "ab", "srl", "spa", "kk", "nv", "as", "oao", "ooo", "pty",
    "llp", "lp", "sarl", "holdings", "limited", "corporation", "company",
    "incorporated", "enterprises", "industries", "systems", "group",
    "partners", "ventures", "bank", "trust")

  private val firstNames = Set(
    "john", "mary", "james", "anna", "maria", "ivan", "chen", "wei",
    "fatima", "ahmed", "mohammed", "david", "sarah", "michael", "elena",
    "sofia", "yuki", "hiroshi", "olga", "hans", "pierre", "marie",
    "juan", "carlos", "ana", "luis", "paulo", "lars", "erik", "ingrid",
    "omar", "layla", "amir", "priya", "raj", "mei", "jin", "min",
    "peter", "kate", "tom", "jane", "alice", "bob", "emma", "noah")

  /** `normality.normalize(lowercase=True, latinize=True)` equivalent:
    * lowercase, NFKD-strip diacritics, collapse non-alnum runs to one
    * space. */
  def normalize(v: String): String = {
    if (v == null) return ""
    val folded = java.text.Normalizer
      .normalize(v.toLowerCase, java.text.Normalizer.Form.NFKD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    val sb = new StringBuilder(folded.length)
    var lastSpace = true
    for (c <- folded) {
      if (c.isLetterOrDigit) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
    }
    sb.toString.trim
  }

  private def softmax(scores: Array[Double]): Array[Double] = {
    val mx = scores.max
    val exps = scores.map(s => math.exp(s - mx))
    val sum = exps.sum
    exps.map(_ / sum)
  }

  /** Feature scores per label over the normalized value. */
  private def rawScores(norm: String): Array[Double] = {
    val toks = norm.split(' ').filter(_.nonEmpty)
    val nTok = toks.length
    val chars = norm.replace(" ", "")
    val nDigits = chars.count(_.isDigit)
    val digitRatio = if (chars.isEmpty) 1.0 else nDigits.toDouble / chars.length
    val vowels = chars.count("aeiouy".contains(_))
    val vowelRatio = if (chars.isEmpty) 0.0 else vowels.toDouble / chars.length

    var person = 0.0
    var company = 0.0
    var trash = 0.0

    if (toks.exists(legalForms.contains)) company += 6.0
    if (toks.headOption.exists(firstNames.contains)) person += 5.0
    if (nTok >= 2 && nTok <= 4 && digitRatio == 0.0) { person += 1.5; company += 0.5 }
    if (nTok >= 2 && vowelRatio >= 0.25) person += 1.0
    if (digitRatio > 0.2) trash += 5.0
    if (vowelRatio < 0.15) trash += 3.0
    if (chars.length < 3 || chars.length > 60) trash += 4.0
    if (nTok == 1) trash += 1.0
    Array(person, company, trash)
  }

  /** (label, confidence) with the reference's entropy confidence. */
  def confidence(value: String): (String, Double) = {
    val norm = normalize(value)
    if (norm.isEmpty) return ("trash", 1.0)
    val p = softmax(rawScores(norm))
    val entropy = -p.map(x => x * math.log(x)).sum
    val conf = 1.0 - entropy / maxEntropy
    val best = p.indices.maxBy(p(_))
    (labels(best), conf)
  }

  /** aggregate.py:21-31 group gate: every value must be non-trash with
    * confidence ≥ threshold, else the whole (key, prop) group is dropped. */
  def groupSurvives(values: Seq[String], threshold: Double = 0.85): Boolean =
    values.nonEmpty && values.forall { v =>
      val (label, conf) = confidence(v)
      label != "trash" && conf >= threshold
    }

  // ---- country tagging (analysis/country.py via countrytagger) -----------

  /** Compact place→ISO-3166 alpha-2 gazetteer standing in for the
    * countrytagger dataset (`analysis/country.py:9-11`). */
  val placeCountry: Map[String, String] = Map(
    // cities
    "berlin" -> "de", "munich" -> "de", "hamburg" -> "de",
    "paris" -> "fr", "lyon" -> "fr", "marseille" -> "fr",
    "london" -> "gb", "manchester" -> "gb", "edinburgh" -> "gb",
    "madrid" -> "es", "barcelona" -> "es",
    "rome" -> "it", "milan" -> "it", "naples" -> "it",
    "lisbon" -> "pt", "porto" -> "pt",
    "amsterdam" -> "nl", "rotterdam" -> "nl",
    "brussels" -> "be", "vienna" -> "at",
    "zurich" -> "ch", "geneva" -> "ch",
    "stockholm" -> "se", "oslo" -> "no", "copenhagen" -> "dk",
    "helsinki" -> "fi", "warsaw" -> "pl", "krakow" -> "pl",
    "prague" -> "cz", "budapest" -> "hu", "bucharest" -> "ro",
    "athens" -> "gr", "dublin" -> "ie",
    "moscow" -> "ru", "kyiv" -> "ua", "istanbul" -> "tr",
    "cairo" -> "eg", "lagos" -> "ng", "nairobi" -> "ke",
    "johannesburg" -> "za", "cape town" -> "za",
    "dubai" -> "ae", "riyadh" -> "sa", "tehran" -> "ir",
    "mumbai" -> "in", "delhi" -> "in", "bangalore" -> "in",
    "beijing" -> "cn", "shanghai" -> "cn", "shenzhen" -> "cn",
    "tokyo" -> "jp", "osaka" -> "jp", "seoul" -> "kr",
    "bangkok" -> "th", "singapore" -> "sg", "jakarta" -> "id",
    "manila" -> "ph", "hanoi" -> "vn",
    "sydney" -> "au", "melbourne" -> "au", "auckland" -> "nz",
    "toronto" -> "ca", "vancouver" -> "ca", "montreal" -> "ca",
    "chicago" -> "us", "boston" -> "us", "washington" -> "us",
    "new york" -> "us", "san francisco" -> "us",
    "mexico city" -> "mx", "bogota" -> "co", "lima" -> "pe",
    "santiago" -> "cl", "buenos aires" -> "ar",
    "sao paulo" -> "br", "rio de janeiro" -> "br",
    // country names
    "germany" -> "de", "france" -> "fr", "spain" -> "es", "italy" -> "it",
    "portugal" -> "pt", "netherlands" -> "nl", "belgium" -> "be",
    "austria" -> "at", "switzerland" -> "ch", "sweden" -> "se",
    "norway" -> "no", "denmark" -> "dk", "finland" -> "fi",
    "poland" -> "pl", "czechia" -> "cz", "hungary" -> "hu",
    "romania" -> "ro", "greece" -> "gr", "ireland" -> "ie",
    "russia" -> "ru", "ukraine" -> "ua", "turkey" -> "tr",
    "egypt" -> "eg", "nigeria" -> "ng", "kenya" -> "ke",
    "south africa" -> "za", "india" -> "in", "china" -> "cn",
    "japan" -> "jp", "thailand" -> "th", "indonesia" -> "id",
    "vietnam" -> "vn", "australia" -> "au", "canada" -> "ca",
    "mexico" -> "mx", "colombia" -> "co", "peru" -> "pe",
    "chile" -> "cl", "argentina" -> "ar", "brazil" -> "br",
    "united kingdom" -> "gb", "united states" -> "us")

  /** `location_country(location)` (`analysis/country.py:9-11`). */
  def locationCountry(location: String): Option[String] =
    placeCountry.get(normalize(location))
}
