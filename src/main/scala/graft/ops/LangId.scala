package graft.ops

import java.lang.Character.UnicodeScript

/** Character-trigram language identification — the from-scratch stand-in for
  * the reference's fastText lid.176 call
  * (`/root/reference/ingestors/analysis/language.py:10-26`), built on the
  * public Cavnar–Trenkle n-gram ranking technique:
  *
  *  1. script vote: scripts with a 1:1 language mapping (Hangul→ko,
  *     Greek→el, Thai→th, ...) short-circuit; Han with kana present → ja;
  *  2. Latin and Cyrillic texts are classified by out-of-place distance
  *     between the document's ranked trigram profile and per-language
  *     profiles trained from embedded seed paragraphs.
  *
  * Everything is deterministic and driver-free: profiles are built once per
  * JVM from constants, `detect` is a pure function usable inside
  * mapPartitions. `testSentences` are held-out (disjoint from the training
  * paragraphs) and double as the oracle corpus for the `t_lang_id` gate.
  */
object LangId extends Serializable {

  /** Fixed language order used by the t_lang_id query/oracle pairing. */
  val ordered: Vector[String] = Vector(
    "en", "de", "fr", "es", "it", "pt", "nl", "sv", "da", "fi", "pl", "cs",
    "ro", "hu", "tr", "ru", "uk", "bg", "el", "ar", "he", "zh", "ja", "ko",
    "th", "hi", "vi", "id", "fa")

  private val latinTrain: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog. this is a sample of english text " +
      "written for language identification purposes. we are testing whether the system can " +
      "recognize common words and patterns in ordinary sentences about everyday things."),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund. dies ist ein beispiel für " +
      "deutschen text, der zur spracherkennung geschrieben wurde. wir prüfen, ob das system " +
      "häufige wörter und muster in gewöhnlichen sätzen über alltägliche dinge erkennen kann."),
    "fr" -> ("le rapide renard brun saute par-dessus le chien paresseux. ceci est un exemple de " +
      "texte français écrit pour l'identification de la langue. nous vérifions si le système " +
      "peut reconnaître les mots courants et les structures des phrases ordinaires."),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso. este es un ejemplo de texto " +
      "español escrito para la identificación del idioma. estamos comprobando si el sistema " +
      "puede reconocer palabras comunes y estructuras en oraciones cotidianas. cada mañana el " +
      "señor garcía compra pan en la panadería de la esquina y luego toma un café con leche " +
      "mientras lee el periódico. españa tiene muchas ciudades hermosas que los turistas " +
      "visitan cada año durante las vacaciones de verano."),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro. questo è un esempio di testo " +
      "italiano scritto per l'identificazione della lingua. stiamo verificando se il sistema " +
      "può riconoscere parole comuni e strutture nelle frasi di tutti i giorni."),
    "pt" -> ("a rápida raposa marrom pula sobre o cão preguiçoso. este é um exemplo de texto em " +
      "português escrito para a identificação do idioma. estamos verificando se o sistema " +
      "consegue reconhecer palavras comuns e estruturas em frases do dia a dia. todas as " +
      "manhãs o senhor silva compra pão na padaria da esquina e depois bebe um café com leite " +
      "enquanto lê o jornal. portugal tem muitas cidades bonitas que os turistas visitam " +
      "todos os anos nas férias de verão."),
    "nl" -> ("de snelle bruine vos springt over de luie hond. dit is een voorbeeld van " +
      "nederlandse tekst geschreven voor taalherkenning. we controleren of het systeem " +
      "veelvoorkomende woorden en patronen in gewone zinnen over alledaagse dingen kan herkennen."),
    "sv" -> ("den snabba bruna räven hoppar över den lata hunden. detta är ett exempel på svensk " +
      "text skriven för språkidentifiering. vi kontrollerar om systemet kan känna igen vanliga " +
      "ord och mönster i vardagliga meningar om helt vanliga saker."),
    "da" -> ("den hurtige brune ræv springer over den dovne hund. dette er et eksempel på dansk " +
      "tekst skrevet til sprogidentifikation. vi kontrollerer om systemet kan genkende " +
      "almindelige ord og mønstre i hverdagens sætninger om ganske almindelige ting."),
    "fi" -> ("nopea ruskea kettu hyppää laiskan koiran yli. tämä on esimerkki suomenkielisestä " +
      "tekstistä, joka on kirjoitettu kielen tunnistamista varten. tarkistamme, voiko " +
      "järjestelmä tunnistaa yleisiä sanoja ja rakenteita tavallisissa lauseissa."),
    "pl" -> ("szybki brązowy lis przeskakuje nad leniwym psem. to jest przykład polskiego tekstu " +
      "napisanego w celu identyfikacji języka. sprawdzamy, czy system potrafi rozpoznać " +
      "popularne słowa i wzorce w zwykłych zdaniach o codziennych sprawach."),
    "cs" -> ("rychlá hnědá liška skáče přes líného psa. toto je ukázka českého textu napsaného " +
      "pro identifikaci jazyka. ověřujeme, zda systém dokáže rozpoznat běžná slova a vzory v " +
      "obyčejných větách o každodenních věcech."),
    "ro" -> ("vulpea maro rapidă sare peste câinele leneș. acesta este un exemplu de text " +
      "românesc scris pentru identificarea limbii. verificăm dacă sistemul poate recunoaște " +
      "cuvinte și modele comune în propoziții obișnuite despre lucruri de zi cu zi."),
    "hu" -> ("a gyors barna róka átugorja a lusta kutyát. ez egy magyar nyelvű szöveg példája, " +
      "amelyet a nyelv azonosítására írtak. ellenőrizzük, hogy a rendszer felismeri-e a gyakori " +
      "szavakat és mintákat a mindennapi dolgokról szóló hétköznapi mondatokban."),
    "tr" -> ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu, dil tanımlama amacıyla " +
      "yazılmış türkçe metin örneğidir. sistemin sıradan cümlelerdeki yaygın kelimeleri ve " +
      "kalıpları tanıyıp tanımadığını kontrol ediyoruz."),
    "vi" -> ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. đây là một ví dụ về văn bản " +
      "tiếng việt được viết để nhận dạng ngôn ngữ. chúng tôi kiểm tra xem hệ thống có thể nhận " +
      "ra các từ và mẫu phổ biến trong các câu thông thường hay không."),
    "id" -> ("rubah coklat yang cepat melompati anjing yang malas. ini adalah contoh teks bahasa " +
      "indonesia yang ditulis untuk identifikasi bahasa. kami memeriksa apakah sistem dapat " +
      "mengenali kata-kata umum dan pola dalam kalimat sehari-hari tentang hal-hal biasa."))

  private val cyrillicTrain: Map[String, String] = Map(
    "ru" -> ("быстрая коричневая лиса прыгает через ленивую собаку. это пример русского текста, " +
      "написанного для определения языка. мы проверяем, может ли система распознавать " +
      "распространённые слова и шаблоны в обычных предложениях о повседневных вещах. мы часто " +
      "гуляем в парке рядом с домом, потому что там очень красиво и тихо. наши друзья приехали " +
      "из москвы, чтобы провести с нами выходные дни, и было бы хорошо, если бы погода " +
      "оставалась тёплыми длинными вечерами такой же ясной."),
    "uk" -> ("швидка коричнева лисиця стрибає через ледачого собаку. це приклад українського " +
      "тексту, написаного для визначення мови. ми перевіряємо, чи може система розпізнавати " +
      "поширені слова та шаблони у звичайних реченнях про повсякденні речі. ми часто гуляємо " +
      "в парку біля будинку, тому що там дуже красиво і тихо. наші друзі приїхали зі львова, " +
      "щоб провести з нами вихідні дні, і погода була теплою та сонячною протягом усього дня."),
    "bg" -> ("бързата кафява лисица прескача мързеливото куче. това е пример за български текст, " +
      "написан за идентифициране на езика. проверяваме дали системата може да разпознава често " +
      "срещани думи и модели в обикновени изречения за ежедневни неща. ние често се разхождаме " +
      "в парка до къщата, защото там е много красиво и тихо. нашите приятели дойдоха от софия, " +
      "за да прекарат почивните дни с нас, и времето беше топло и слънчево през целия ден."))

  /** Held-out sentences (disjoint from the training paragraphs) — the
    * accuracy gate corpus for the t_lang_id oracle and LangIdSpec. */
  val testSentences: Map[String, String] = Map(
    "en" -> "many people enjoy reading books about history and science during the long winter evenings.",
    "de" -> "viele menschen lesen gerne bücher über geschichte und wissenschaft an langen winterabenden.",
    "fr" -> "beaucoup de gens aiment lire des livres sur l'histoire et la science pendant les longues soirées d'hiver.",
    "es" -> "mucha gente disfruta leyendo libros sobre historia y ciencia durante las largas tardes de invierno.",
    "it" -> "molte persone amano leggere libri di storia e di scienza durante le lunghe serate invernali.",
    "pt" -> "muitas pessoas gostam de ler livros sobre história e ciência durante as longas noites de inverno.",
    "nl" -> "veel mensen lezen graag boeken over geschiedenis en wetenschap tijdens de lange winteravonden.",
    "sv" -> "många människor tycker om att läsa böcker om historia och vetenskap under de långa vinterkvällarna.",
    "da" -> "mange mennesker kan lide at læse bøger om historie og videnskab i de lange vinteraftener.",
    "fi" -> "monet ihmiset lukevat mielellään kirjoja historiasta ja tieteestä pitkinä talvi-iltoina.",
    "pl" -> "wiele osób lubi czytać książki o historii i nauce podczas długich zimowych wieczorów.",
    "cs" -> "mnoho lidí rádo čte knihy o historii a vědě během dlouhých zimních večerů.",
    "ro" -> "mulți oameni citesc cu plăcere cărți despre istorie și știință în lungile seri de iarnă.",
    "hu" -> "sok ember szeret könyveket olvasni a történelemről és a tudományról a hosszú téli estéken.",
    "tr" -> "birçok insan uzun kış akşamlarında tarih ve bilim hakkında kitap okumaktan hoşlanır.",
    "ru" -> "многие люди любят читать книги об истории и науке долгими зимними вечерами.",
    "uk" -> "багато людей люблять читати книги про історію та науку довгими зимовими вечорами.",
    "bg" -> "много хора обичат да четат книги за история и наука през дългите зимни вечери.",
    "el" -> "πολλοί άνθρωποι απολαμβάνουν να διαβάζουν βιβλία για την ιστορία και την επιστήμη τα χειμωνιάτικα βράδια.",
    "ar" -> "يستمتع كثير من الناس بقراءة الكتب عن التاريخ والعلوم في أمسيات الشتاء الطويلة.",
    "he" -> "אנשים רבים נהנים לקרוא ספרים על היסטוריה ומדע בערבי החורף הארוכים.",
    "zh" -> "许多人喜欢在漫长的冬夜阅读关于历史和科学的书籍。",
    "ja" -> "多くの人は長い冬の夜に歴史や科学についての本を読むのを楽しんでいます。",
    "ko" -> "많은 사람들이 긴 겨울 저녁에 역사와 과학에 관한 책을 읽는 것을 즐깁니다.",
    "th" -> "หลายคนชอบอ่านหนังสือเกี่ยวกับประวัติศาสตร์และวิทยาศาสตร์ในค่ำคืนฤดูหนาวที่ยาวนาน",
    "hi" -> "बहुत से लोग लंबी सर्दियों की शामों में इतिहास और विज्ञान के बारे में किताबें पढ़ना पसंद करते हैं।",
    "vi" -> "nhiều người thích đọc sách về lịch sử và khoa học trong những buổi tối mùa đông dài.",
    "id" -> "banyak orang senang membaca buku tentang sejarah dan ilmu pengetahuan pada malam musim dingin yang panjang.",
    "fa" -> "بسیاری از مردم در شب‌های طولانی زمستان از خواندن کتاب‌های تاریخی و علمی لذت می‌برند.")

  private val TopN = 300

  /** Lowercase, map every non-letter run to a single space (word boundary). */
  private def norm(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append(' ')
    var lastSpace = true
    var i = 0
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if (Character.isLetter(c)) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    sb.toString
  }

  /** Ranked trigram profile: trigrams by (freq desc, trigram asc), top n. */
  private def profile(normed: String, n: Int): Array[String] = {
    val counts = new scala.collection.mutable.HashMap[String, Int]
    var i = 0
    while (i + 3 <= normed.length) {
      val g = normed.substring(i, i + 3)
      if (!(g.charAt(0) == ' ' && g.charAt(1) == ' '))
        counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    counts.toArray.sortBy { case (g, c) => (-c, g) }.take(n).map(_._1)
  }

  private def rankMap(train: String): Map[String, Int] =
    profile(norm(train), TopN).zipWithIndex.toMap

  private lazy val latinProfiles: Seq[(String, Map[String, Int])] =
    latinTrain.toSeq.sortBy(_._1).map { case (l, t) => l -> rankMap(t) }
  private lazy val cyrillicProfiles: Seq[(String, Map[String, Int])] =
    cyrillicTrain.toSeq.sortBy(_._1).map { case (l, t) => l -> rankMap(t) }

  /** Cavnar–Trenkle out-of-place distance; deterministic tie-break by
    * language code. */
  private def classify(text: String, profiles: Seq[(String, Map[String, Int])]): String = {
    val doc = profile(norm(text), TopN)
    if (doc.isEmpty) return "und"
    var best = "und"
    var bestD = Long.MaxValue
    for ((lang, prof) <- profiles) {
      var d = 0L
      var r = 0
      while (r < doc.length) {
        d += (prof.get(doc(r)) match {
          case Some(pr) => math.abs(pr - r).toLong
          case None => TopN.toLong
        })
        r += 1
      }
      if (d < bestD) { bestD = d; best = lang }
    }
    best
  }

  /** Detect the language of `text`; "und" when undecidable. */
  def detect(text: String): String = {
    if (text == null) return "und"
    val t = if (text.length > 4000) text.substring(0, 4000) else text
    var latin, cyr, han, kana, hangul, arabic, hebrew, greek, thai, deva = 0
    var letters = 0
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => latin += 1
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.HAN => han += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
          case UnicodeScript.HANGUL => hangul += 1
          case UnicodeScript.ARABIC => arabic += 1
          case UnicodeScript.HEBREW => hebrew += 1
          case UnicodeScript.GREEK => greek += 1
          case UnicodeScript.THAI => thai += 1
          case UnicodeScript.DEVANAGARI => deva += 1
          case _ => ()
        }
      }
      i += Character.charCount(cp)
    }
    if (letters < 5) return "und"
    val half = letters / 2
    if (hangul > half) "ko"
    else if (han + kana > half) { if (kana >= 2) "ja" else "zh" }
    else if (arabic > half) {
      // Persian extends the Arabic script with پ چ ژ گ and spells with
      // FARSI YEH (U+06CC) / KEHEH (U+06A9) where Arabic uses ي / ك —
      // their presence separates fa from ar without a trigram pass
      if (t.exists(c => c == 'پ' || c == 'چ' || c == 'ژ' || c == 'گ' ||
        c == 'ی' || c == 'ک')) "fa"
      else "ar"
    }
    else if (hebrew > half) "he"
    else if (greek > half) "el"
    else if (thai > half) "th"
    else if (deva > half) "hi"
    else if (cyr > half) classify(t, cyrillicProfiles)
    else if (latin > half) classify(t, latinProfiles)
    else "und"
  }
}
