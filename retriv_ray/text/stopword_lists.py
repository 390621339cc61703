"""Embedded stop-word lists for the non-english languages.

Source: the Snowball project's published stop-word files (public data;
the same lists NLTK packages for these languages). The reference
resolves all of its 29 language names through NLTK's corpus
(reference retriv/sparse_retriever/preprocessing/stopwords.py:5-43);
embedding the lists removes the corpus-download dependency. Minor
deltas vs NLTK's copies are possible where NLTK post-edited a list;
callers needing exact NLTK parity should pass an explicit list.

Lists are deduplicated preserving first occurrence (a few Snowball
files repeat forms across verb sections).
"""

from __future__ import annotations


def _dedup(words):
    return list(dict.fromkeys(words))


GERMAN = _dedup("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann der den des dem die das dass derselbe
derselben denselben desselben demselben dieselbe dieselben dasselbe
dazu dein deine deinem deinen deiner deines denn derer dessen dich dir
du dies diese diesem diesen dieser dieses doch dort durch ein eine
einem einen einer eines einig einige einigem einigen einiger einiges
einmal er ihn ihm es etwas euer eure eurem euren eurer eures für gegen
gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem
manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein
seine seinem seinen seiner seines selbst sich sie ihnen sind so solche
solchem solchen solcher solches soll sollte sondern sonst über um und
uns unsere unserem unseren unser unseres unter viel vom von vor
während war waren warst was weg weil weiter welche welchem welchen
welcher welches wenn werde werden wie wieder will wir wird wirst wo
wollen wollte würde würden zu zum zur zwar zwischen
""".split())

FRENCH = _dedup("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les
leur lui ma mais me même mes moi mon ne nos notre nous on ou par pas
pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
votre vous c d j l à n s t y été étée étées étés étant étante étants
étantes suis es est sommes êtes sont serai seras sera serons serez
seront serais serait serions seriez seraient étais était étions étiez
étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse
fusses fût fussions fussiez fussent ayant ayante ayantes ayants eu eue
eues eus ai as avons avez ont aurai auras aura aurons aurez auront
aurais aurait aurions auriez auraient avais avait avions aviez avaient
eut eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses eût
eussions eussiez eussent
""".split())

SPANISH = _dedup("""
de la que el en y a los del se las por un para con no una su al lo
como más pero sus le ya o este sí porque esta entre cuando muy sin
sobre también me hasta hay donde quien desde todo nos durante todos
uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué
unos yo otro otras otra él tanto esa estos mucho quienes nada muchos
cual poco ella estar estas algunas algo nosotros mi mis tú te ti tu
tus ellas nosotras vosotros vosotras os mío mía míos mías tuyo tuya
tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros nuestras
vuestro vuestra vuestros vuestras esos esas estoy estás está estamos
estáis están esté estés estemos estéis estén estaré estarás estará
estaremos estaréis estarán estaría estarías estaríamos estaríais
estarían estaba estabas estábamos estabais estaban estuve estuviste
estuvo estuvimos estuvisteis estuvieron estuviera estuvieras
estuviéramos estuvierais estuvieran estuviese estuvieses estuviésemos
estuvieseis estuviesen estando estado estada estados estadas estad he
has ha hemos habéis han haya hayas hayamos hayáis hayan habré habrás
habrá habremos habréis habrán habría habrías habríamos habríais
habrían había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran
hubiese hubieses hubiésemos hubieseis hubiesen habiendo habido habida
habidos habidas soy eres es somos sois son sea seas seamos seáis sean
seré serás será seremos seréis serán sería serías seríamos seríais
serían era eras éramos erais eran fui fuiste fue fuimos fuisteis
fueron fuera fueras fuéramos fuerais fueran fuese fueses fuésemos
fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis tienen
tenga tengas tengamos tengáis tengan tendré tendrás tendrá tendremos
tendréis tendrán tendría tendrías tendríamos tendríais tendrían tenía
tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran tuviese
tuvieses tuviésemos tuvieseis tuviesen teniendo tenido tenida tenidos
tenidas tened
""".split())

ITALIAN = _dedup("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai
dagli dall dagl dalla dalle di del dello dei degli dell degl della
delle in nel nello nei negli nell negl nella nelle su sul sullo sui
sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
ne il un uno una ma ed se perché anche come dov dove che chi cui non
più quale quanto quanti quanta quante quello quelli quella quelle
questo questi questa queste si tutto tutti a c e i l o ho hai ha
abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo
avrete avranno avrei avresti avrebbe avremmo avreste avrebbero avevo
avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute
sono sei è siamo siete sia siate siano sarò sarai sarà saremo sarete
saranno sarei saresti sarebbe saremmo sareste sarebbero ero eri era
eravamo eravate erano fui fosti fu fummo foste furono fossi fosse
fossimo fossero essendo faccio fai facciamo fanno faccia facciate
facciano farò farai farà faremo farete faranno farei faresti farebbe
faremmo fareste farebbero facevo facevi faceva facevamo facevate
facevano feci facesti fece facemmo faceste fecero facessi facesse
facessimo facessero facendo sto stai sta stiamo stanno stia stiate
stiano starò starai starà staremo starete staranno starei staresti
starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando stato stata stati state
""".split())

PORTUGUESE = _dedup("""
de a o que e do da em um para é com não uma os no se na por mais as
dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos
já está eu também só pelo pela até isso ela entre era depois sem
mesmo aos ter seus quem nas me esse eles estão você tinha foram essa
num nem suas meu às minha têm numa pelos elas havia seja qual será
nós tenho lhe deles essas esses pelas este fosse dele tu te vocês vos
lhes meus minhas teu tua teus tuas nosso nossa nossos nossas dela
delas esta estes estas aquele aquela aqueles aquelas isto aquilo
estou estamos estive esteve estivemos estiveram estava estávamos
estavam estivera estivéramos esteja estejamos estejam estivesse
estivéssemos estivessem estiver estivermos estiverem hei havemos hão
houve houvemos houveram houvera houvéramos haja hajamos hajam
houvesse houvéssemos houvessem houver houvermos houverem houverei
houverá houveremos houverão houveria houveríamos houveriam sou somos
são éramos eram fui fomos fora fôramos sejamos sejam fôssemos fossem
for formos forem serei seremos serão seria seríamos seriam temos tém
tínhamos tinham tive teve tivemos tiveram tivera tivéramos tenha
tenhamos tenham tivesse tivéssemos tivessem tiver tivermos tiverem
terei terá teremos terão teria teríamos teriam
""".split())

RUSSIAN = _dedup("""
и в во не что он на я с со как а то все она так его но да ты к у же
вы за бы по только ее мне было вот от меня еще нет о из ему теперь
когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
опять уж вам ведь там потом себя ничего ей может они тут где есть
надо ней для мы тебя их чем была сам чтоб без будто чего раз тоже
себе под будет ж тогда кто этот того потому этого какой совсем ним
здесь этом один почти мой тем чтобы нее сейчас были куда зачем всех
никогда можно при наконец два об другой хоть после над больше тот
через эти нас про всего них какая много разве три эту моя впрочем
хорошо свою этой перед иногда лучше чуть том нельзя такой им более
всегда конечно всю между
""".split())

DANISH = _dedup("""
og i jeg det at en den til er som på de med han af for ikke der var
mig sig men et har om vi min havde ham hun nu over da fra du ud sin
dem os op man hans hvor eller hvad skal selv her alle vil blev kunne
ind når være dog noget ville jo deres efter ned skulle denne end
dette mit også under have dig anden hende mine alt meget sit sine vor
mod disse hvis din nogle hos blive mange ad bliver hendes været thi
jer sådan
""".split())

NORWEGIAN = _dedup("""
og i jeg det at en et den til er som på de med han av ikke ikkje der
så var meg seg men ett har om vi min mitt ha hadde hun nå over da ved
fra du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl
her alle vil bli ble blei blitt kunne inn når være kom noen noe ville
dere deres kun ja etter ned skulle denne for deg si sine sitt mot å
meget hvorfor dette disse uten hvordan ingen din ditt blir samme
hvilken hvilke sånn inni mellom vår hver hvem vors hvis både bare enn
fordi før mange også slik vært vere båe begge siden dykk dykkar dei
deira deires deim di då eg ein eit eitt elles honom hjå ho hoe henne
hennar hennes hoss hossen ingi inkje korleis korso kva kvar kvarhelst
kven kvi kvifor me medan mi mine mykje no nokon noka nokor noko nokre
si sia sidan so somt somme um upp vore verte vort varte vart
""".split())

SWEDISH = _dedup("""
och det att i en jag hon som han på den med var sig för så till är
men ett om hade de av icke mig du henne då sin nu har inte hans honom
skulle hennes där min man ej vid kunde något från ut när efter upp vi
dem vara vad över än dig kan sina här ha mot alla under någon eller
allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt
ni bli blev oss din dessa några deras blir mina samma vilken er sådan
vår blivit dess inom mellan sådant varför varje vilka ditt vem vilket
sitta sådana vart dina vars vårt våra ert era vilkas
""".split())

DUTCH = _dedup("""
de en van ik te dat die in een hij het niet zijn is was op aan met
als voor had er maar om hem dan zou of wat mijn men dit zo door over
ze zich bij ook tot je mij uit der daar haar naar heb hoe heeft
hebben deze u want nog zal me zij nu ge geen omdat iets worden toch
al waren veel meer doen toen moet ben zonder kan hun dus alles onder
ja eens hier wie werd altijd doch wordt wezen kunnen ons zelf tegen
na reeds wil kon niets uw iemand geweest andere
""".split())

FINNISH = _dedup("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut
olleet en et ei emme ette eivät minä minun minut minua minussa
minusta minuun minulla minulta minulle sinä sinun sinut sinua sinussa
sinusta sinuun sinulla sinulta sinulle hän hänen hänet häntä hänessä
hänestä häneen hänellä häneltä hänelle me meidän meidät meitä meissä
meistä meihin meillä meiltä meille te teidän teidät teitä teissä
teistä teihin teillä teiltä teille he heidän heidät heitä heissä
heistä heihin heillä heiltä heille tämä tämän tätä tässä tästä tähän
tällä tältä tälle tänä täksi tuo tuon tuota tuossa tuosta tuohon
tuolla tuolta tuolle tuona tuoksi se sen sitä siinä siitä siihen
sillä siltä sille sinä siksi nämä näiden näitä näissä näistä näihin
näillä näiltä näille näinä näiksi nuo noiden noita noissa noista
noihin noilla noilta noille noina noiksi ne niiden niitä niissä
niistä niihin niillä niiltä niille niinä niiksi kuka kenen kenet ketä
kenessä kenestä keneen kenellä keneltä kenelle kenenä keneksi ketkä
keiden keitä keissä keistä keihin keillä keiltä keille keinä keiksi
mikä minkä mitä missä mistä mihin millä miltä mille minä miksi kuin
ja että joka jonka jota jossa josta johon jolla jolta jolle jona
joksi jotka joiden joita joissa joista joihin joilla joilta joille
joina joiksi mutta niin sekä tai vaan vai vaikka kanssa mukaan noin
poikki yli kun nyt itse
""".split())

HUNGARIAN = _dedup("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán
azután azonban bár be belül benne cikk cikkek cikkeket csak de e
eddig egész egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen
elő először előtt első én éppen ebben ehhez emilyen ennek erre ez ezt
ezek ezen ezzel ezért és fel felé hanem hiszen hogy hogyan igen így
illetve ill. ill ilyen ilyenkor ison ismét itt jó jól jobban kell
kellett keresztül keressünk ki kívül között közül legalább lehet
lehetett legyen lenne lenni lesz lett maga magát majd már más másik
meg még mellett mert mely melyek mi mit míg miért milyen mikor minden
mindent mindenki mindig mint mintha mivel most nagy nagyobb nagyon ne
néha nekem neki nem néhány nélkül nincs olyan ott össze ő ők őket
pedig persze rá s saját sem semmi sok sokat sokkal számára szemben
szerint szinte talán tehát teljes tovább továbbá több úgy ugyanis új
újabb újra után utána utolsó vagy vagyis valaki valami valamint való
vagyok van vannak volt voltam voltak voltunk vissza vele viszont
volna
""".split())

# Romanian has no Snowball stop-word file; this is the standard public
# Romanian function-word list (articles, pronouns, prepositions,
# conjunctions, common fi/avea forms) as shipped in the common
# open-source collections. Not byte-exact to NLTK's copy.
ROMANIAN = _dedup("""
a abia acea aceasta această aceea acei aceia acel acela acele acelea
acest acesta aceste acestea acestei acestor acestui acum ai aia aibă
aici al ale alt alta altă alte altul am anume apoi ar are as asa așa
asta astăzi astfel asupra atât atat atâta atunci au avea avem aveți
avut azi ba bine ca că cam când care carora căror cărora ce cea ceea
cei ceilalti cel cele celor ceva chiar ci cind cine cineva cit cît
câtva cu cui cum cumva curând da dă dacă dar daca de deci deja
deoarece departe deși din dinaintea dintr dintre doar două drept după
ea ei el ele era eram este ești eu face fara fără fel fi fie fiecare
fii fim fiu foarte fost ia iar ieri îi îl îmi împotriva în înainte
înaintea încât încît încotro între întrucât întrucît îți la lângă le
li lor lui mă mai mea mei mele mereu meu mi mie mine mult multă mulți
ne nicăieri nici nimeni nimic niste niște noastră noastre noi noștri
nostru nou nouă nu o ori oricând oricare oricât orice oricum oricine
oriunde până pe pentru peste prea prima primul prin printr sa să săi
sale sau său se și sînt sintem spate spre sub sunt suntem sunteți te
ți toată toate tot toți totuși tu un una unde undeva unei unele uneori
unor vă vi voastre vostru vouă vreo vreun
""".split())

LISTS = {
    "german": GERMAN,
    "french": FRENCH,
    "spanish": SPANISH,
    "italian": ITALIAN,
    "portuguese": PORTUGUESE,
    "russian": RUSSIAN,
    "danish": DANISH,
    "norwegian": NORWEGIAN,
    "swedish": SWEDISH,
    "dutch": DUTCH,
    "finnish": FINNISH,
    "hungarian": HUNGARIAN,
    "romanian": ROMANIAN,
}

# Turkish: NLTK's turkish list is a 53-word function-word list (not a
# Snowball file — Snowball publishes no turkish stop words); embedded
# verbatim from the public corpus.
TURKISH = _dedup("""
acaba ama aslında az bazı belki biri birkaç birşey biz bu çok çünkü
da daha de defa diye eğer en gibi hem hep hepsi her hiç için ile ise
kez ki kim mı mu mü nasıl ne neden nerde nerede nereye niçin niye o
sanki şey siz şu tüm ve veya ya yani
""".split())

# Indonesian: a function-word core (pronouns, prepositions,
# conjunctions, auxiliaries, question words, common discourse
# particles). NLTK's indonesian list (from Tala's corpus) is much
# larger (~750 forms, mostly derived variants); callers needing exact
# NLTK parity should pass that list explicitly.
INDONESIAN = _dedup("""
ada adalah adanya agak agar akan aku anda antara apa apakah atas atau
bagaimana bagi bahkan bahwa baik banyak baru beberapa begitu belum
berada berapa bisa bukan dalam dan dapat dari darinya demikian dengan
depan di dia dialah dini dua gunanya hanya harus hingga ia ialah ini
itu itulah jadi jangan jika juga kalau kami kamu kapan karena ke
kemudian kenapa kepada ketika kita lagi lain lalu lebih maka mana
masih melainkan melakukan memang mengapa mereka merupakan meski
meskipun namun nanti oleh pada padahal para per pernah pula pun saat
saja sama sambil sampai sana sangat saya sebab sebagai sebelum
sebuah sedang sedangkan segera sehingga sejak sekarang sekitar
selain selalu selama seluruh sementara semua sendiri seorang seperti
sering serta sesuatu setelah setiap siapa sini situ suatu sudah
supaya tanpa tapi telah tentang tentu terhadap termasuk tersebut
tetapi tiap tidak untuk walaupun yaitu yakni yang
""".split())

LISTS["turkish"] = TURKISH
LISTS["indonesian"] = INDONESIAN

# ---------------------------------------------------------------------------
# Round-4 additions: the remaining 13 languages of the reference's 29
# (reference retriv/sparse_retriever/preprocessing/stopwords.py:5-34).
# NLTK's corpus files are not downloadable in this environment; each
# list below is a reconstruction of the public list (NLTK /
# stopwords-iso lineage) covering the language's closed-class function
# words — pronouns, adpositions, conjunctions, copula/auxiliary forms,
# determiners, question words, common particles. Exact NLTK parity is
# not guaranteed (the embedded-list caveat at the top of this module
# applies); callers needing the byte-exact corpus list should pass it
# explicitly.
# ---------------------------------------------------------------------------

ARABIC = _dedup("""
في من على إلى الى عن مع هذا هذه هذان هاتان هؤلاء ذلك تلك ذانك أولئك
الذي التي الذين اللذان اللتان اللاتي اللواتي اللائي هو هي هما هم هن
أنا نحن أنت أنتما أنتم أنتن إياه إياها إياهم كان كانت كانا كانوا كن
يكون تكون أكون نكون كنت كنا كنتم ليس ليست ليسوا لست لسنا أصبح أضحى
أمسى بات صار ظل مازال مادام أن إن أنه أنها أنهم إنه إنها إنهم لا لم
لن ما ماذا متى أين أينما كيف كيفما لماذا لمَ هل و ف ثم أو أم بل حتى
إذا إذ إذما لو لولا لوما لكن لكنه لكنها قد لقد كل كلما بعض غير بين
فوق تحت أمام خلف وراء قبل بعد عند عندما منذ مذ ضد حول دون سوى كما
لأن لدى لدي إلا ألا أيضا أيضاً فقط ثمة هناك هنالك هنا ذا ذي ذو كلا
كلتا أي أية أيها مما ممن فيه فيها فيهم منه منها منهم عليه عليها
عليهم إليه إليها إليهم معه معها معهم له لها لهم لهما لنا لكم لكما لي
لك به بها بهم بهما بي بك بنا بكم أنّ إنّ يا أما إما نحو عبر خلال حسب
ضمن مثل مثلما أكثر أقل جدا جداً بضع بعدما بينما حيث حيثما ريث عل علّ
لعل لعلّ كأن كأنّ كأنما كي كيلا لكي لكيلا هكذا هاهنا أنى شتان سوف
ولا وما ومن وهو وهي آه آها إي نعم بلى كلا اللهم ولكن فإن وإن وإذا
وقد ومع وعن وعلى وفي ذلكم أولاء هذي هاته تينك تانك عما عمن فيما
""".split())

AZERBAIJANI = _dedup("""
a ad altı altmış amma arasında artıq ay az bax belə bəli bəlkə bəs
bəzən bəzi bilər bir biraz biri birşey biz bizim bizlər bu buna
bundan bunlar bunların bunu bunun buradan bütün ci cı cu cü cü çox
çünki da daha də dedi dək dən dəqiqə deyil dir doqquz doqsan dörd
düz ə edən edir əgər əlbəttə elə əlli ən əslində et etdi etmə etmək
faiz gilə görə ha haqqında harada hə heç həm həmin həmişə hansı hara
hər hətta iki il ilə ildə ilk indi isə istifadə iyirmi ki kim kimə
kimi lakin lap məhz mən mənə mirşey müəyyən nə necə nəyə niyə o obirisi
of olan olar olaraq oldu olduğu olmadı olmaz olmuşdur olsun olur on
ona ondan onlar onlardan onların onsuzda onu onun orada otuz oğlan
öz özü qarşı qədər qırx saat sadəcə saniyə səhv səkkiz səksən sən
sənə sənin siz sizin sizlər sonra səbəb üç üçün var və ya yalnız
yaxşı yeddi yenə yetmiş yox yoxdur yoxsa yüz zaman
""".split())

BASQUE = _dedup("""
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek
beste bezala da dago dira ditu du dute edo egin ere eta eurak ez
gainera gu gutxi guzti haiei haiek haietan hainbeste hala han handik
hango hara hari hark hartan hau hauei hauek hauetan hemen hemendik
hemengo hi hona honek honela honetan honi hor hori horiei horiek
horietan horko horra horrek horrela horretan horri hortik hura izan
ni noiz nola non nondik nongo nor nora ze zein zen zenbait zenbat
zer zergatik ziren zituen zu zuek zuen zuten
""".split())

BENGALI = _dedup("""
অতএব অথচ অথবা অনুযায়ী অনেক অনেকে অন্তত অন্য অবধি অবশ্য আগে আছে আজ
আপনার আপনি আবার আমরা আমাকে আমাদের আমার আমি আর আরও ই ইত্যাদি উচিত
উনি উপর এ এঁদের এঁরা এই একই একটি একবার একে এখন এখনও এখানে এখানেই
এটা এটাই এটি এত এতটাই এতে এদের এব এবং এবার এমন এমনকী এমনি এর এরা
এল এস এসে ঐ ও ওঁদের ওঁর ওঁরা ওই ওকে ওখানে ওদের ওর ওরা কখনও কত কবে
কয়েক কয়েকটি করছে করছেন করতে করবে করবেন করলে করলেন করা করাই করায়
করার করি করিতে করিয়া করিয়ে করে করেই করেছিলেন করেছে করেছেন করেন
কাউকে কাছ কাছে কাজ কাজে কারও কারণ কি কিংবা কিছু কিছুই কিন্তু কী কে
কেউ কেউই কেন কোটি কোন কোনও কোনো ক্ষেত্রে খুব গিয়ে গিয়েছে গেছে গেল
গেলে গোটা চলে চান চায় চার চালু চেয়ে চেষ্টা ছাড়া ছাড়াও ছিল ছিলেন
জন জনকে জনের জন্য জানতে জানা জানানো জানায় জানিয়ে জানিয়েছে টি ঠিক
তখন তত তথা তবু তবে তা তাঁকে তাঁদের তাঁর তাঁরা তাই তাও তাকে তাতে
তাদের তার তারপর তারা তাহলে তাহা তাহাতে তাহার তিনি তিনিও তুমি তুলে
তেমন তো তোমার থাকবে থাকবেন থাকা থাকায় থাকে থাকেন থেকে থেকেই থেকেও
দিকে দিতে দিন দিয়ে দিয়েছে দিয়েছেন দিলেন দু দুই দুটি দুটো দেওয়া
দেওয়ার দেখতে দেখা দেখে দেন দেয় দ্বারা ধরা ধরে নতুন নয় না নাই নাকি
নাগাদ নানা নিজে নিজেই নিজেদের নিজের নিতে নিয়ে নিয়েই নেই নেওয়া
নেওয়ার পক্ষে পর পরে পরেই পরেও পর্যন্ত পাওয়া পারি পারে পারেন পেয়ে
প্রতি প্রথম প্রভৃতি প্রায় ফলে ফিরে ফের বক্তব্য বদলে বরং বলতে বলল
বললেন বলা বলে বলেছেন বলেন বসে বহু বা বাদে বার বিনা বিভিন্ন বিশেষ
বিষয়টি বেশ বেশি ব্যবহার ব্যাপারে ভাবে ভাবেই মতো মতোই মধ্যে মধ্যেই
মধ্যেও মনে মাত্র মাধ্যমে মোট মোটেই যখন যত যতটা যথেষ্ট যদি যদিও যা
যাঁর যাঁরা যাওয়া যাওয়ার যাকে যাচ্ছে যাতে যাদের যান যাবে যায় যার
যারা যিনি যে যেখানে যেতে যেন যেমন রকম রয়েছে রাখা রেখে শুধু শুরু
সঙ্গে সঙ্গেও সব সবার সমস্ত সম্প্রতি সহ সহিত সাধারণ সামনে সুতরাং সে
সেই সেখান সেখানে সেটা সেটাই সেটাও সেটি স্পষ্ট স্বয়ং হইতে হইবে হইয়া
হওয়া হওয়ায় হওয়ার হচ্ছে হত হতে হতেই হন হবে হবেন হয় হয়তো হয়নি
হয়ে হয়েই হয়েছিল হয়েছে হয়েছেন হল হলে হলেই হলেও হলো হাজার হিসাবে
হোক হয়
""".split())

CATALAN = _dedup("""
a abans ací ah així això al als altra altre altres amb ambdós
ambdues apenes aquell aquella aquelles aquells aquest aquesta
aquestes aquests aquí baix cada cadascú cadascuna cadascunes
cadascuns com contra d'un d'una d'unes d'uns dalt de del dels des
després dins dintre donat doncs durant e eh el els em en encara ens
entre érem eren éreu es és esta està estàvem estaven estàveu esteu
et etc ets fins fora gairebé ha han has havia he hem heu hi ho i
igual iguals ja la les li llavors m'he ma mal malgrat mateix mateixa
mateixes mateixos me mentre més meu meus meva meves molt molta
moltes molts mon mons n'he n'hi ne ni no només nosaltres nostra
nostre nostres o oh oi on pas pel pels per però perquè poc poca pocs
poques potser propi qual quals quan quant que què quelcom qui quin
quina quines quins s'ha s'han sa semblant semblants ses seu seus
seva seves si sobre sobretot sóc solament sols son són sons sota sou
t'ha t'han t'he ta tal també tampoc tan tant tanta tantes teu teus
teva teves ton tons tot tota totes tots un una unes uns us va vaig
vam van vas veu vosaltres vostra vostre vostres
""".split())

CHINESE = _dedup("""
的 一 不 在 人 有 是 为 以 于 上 他 而 后 之 来 及 了 因 下 可 到 由 这
与 也 此 但 并 个 其 已 无 小 我 们 起 最 再 今 去 好 只 又 或 很 亦 某
把 那 你 乃 它 吧 被 比 别 趁 当 从 得 打 凡 儿 尔 该 各 给 跟 和 何 还
即 几 既 看 据 距 靠 啦 另 么 每 嘛 拿 哪 您 凭 且 却 让 仍 啥 如 若 使
谁 虽 随 同 所 她 哇 往 些 向 沿 哟 用 咱 则 怎 曾 至 致 着 诸 自 我们
你们 他们 她们 它们 这个 那个 这些 那些 这样 那样 什么 怎么 为什么
因为 所以 但是 可是 然而 而且 并且 或者 如果 虽然 即使 无论 不论
只要 只有 除了 关于 对于 由于 通过 根据 按照 经过 作为 没有 不是
就是 也是 还是 都是 可以 能够 应该 必须 已经 正在 将要 曾经 一直
一些 一种 一样 这里 那里 哪里 时候 现在 然后 接着 于是 其中 其他
其它 大家 自己 之一 之中 之间 以及 以后 以前 以为 以上 以下 而是
不过 不能 不会 不要 这种 那种 上面 下面 里面 外面 旁边 之后 之前
本身 对 从而 而言 来说 吗 呢 啊 哦 嗯 呀 吧 罢了 而已 何况 况且
的话 的确 之类 等等 例如 譬如 比如
""".split())

GREEK = _dedup("""
αλλα αλλά αν αντι αντί απο από αυτα αυτά αυτες αυτές αυτη αυτή αυτο
αυτό αυτοι αυτοί αυτος αυτός αυτους αυτούς αυτων αυτών για δε δεν
εαν εάν ειμαι είμαι ειμαστε είμαστε ειναι είναι εισαι είσαι ειστε
είστε εκεινα εκείνα εκεινες εκείνες εκεινη εκείνη εκεινο εκείνο
εκεινοι εκείνοι εκεινος εκείνος εκεινους εκείνους εκεινων εκείνων
ενω ενώ επι επί η ή θα ισως ίσως κ και κατα κατά κι μα με μετα μετά
μη μην να ο οι ομως όμως οπως όπως οσο όσο οτι ότι παρα παρά ποια
ποιά ποιες ποιές ποιο ποιό ποιοι ποιοί ποιος ποιός ποιους ποιούς
ποιων ποιών που πού προς πως πώς σε στη στην στο στον τα την της το
τον τοτε τότε του των ως σας σου μας μου τους τις τη εγω εγώ εσυ εσύ
εμεις εμείς εσεις εσείς ειχα είχα ειχε είχε ειχαν είχαν εχω έχω εχει
έχει εχουν έχουν εχουμε έχουμε ηταν ήταν ειτε είτε ουτε ούτε μηπως
μήπως ωστε ώστε ωστοσο ωστόσο επειδη επειδή αφου αφού ολα όλα ολοι
όλοι ολες όλες ολη όλη ολο όλο ολος όλος καθε κάθε μερικα μερικά
μερικοι μερικοί κατι κάτι τιποτα τίποτα καποιος κάποιος καποια
κάποια καποιο κάποιο πολυ πολύ πολλα πολλά λιγο λίγο τωρα τώρα εδω
εδώ εκει εκεί πανω πάνω κατω κάτω μεσα μέσα εξω έξω πριν μεχρι μέχρι
χωρις χωρίς δηλαδη δηλαδή ακομα ακόμα ακομη ακόμη ετσι έτσι οταν
όταν οπου όπου γιατι γιατί τι σαν προ μον μόνο μονο
""".split())

HEBREW = _dedup("""
אבל או אולי אותה אותו אותי אותך אותם אותן אותנו אז אחר אחרות אחרי
אחרים אחרת אי איזה איך אין איפה איתה איתו איתי איתך איתכם איתכן
איתם איתן איתנו אך אל אלה אלו אם אנחנו אני אף אצל אשר את אתה אתכם
אתכן אתם אתן בגלל בין בלי במידה בעבור ברם בשביל בתוך גם דרך הוא היא
היה היכן היתה הם הן הנה הרי ואילו ואת זאת זה זו יהיה יוכל יוכלו
יותר יכול יכולה יכולות יכולים יכל יכלה יכלו יש כאן כאשר כולם כולן
כזה כי כיצד כך ככה כל כלל כמו כן כפי כש לא לאן לבין לה להיות להם
להן לו לי לך לכם לכן למה למטה למעלה למרות לנו לעבר לפיכך לפני מאד
מאחורי מאין מאיפה מבלי מבעד מדוע מה מהיכן מול מחוץ מי מכאן מכיוון
מלבד מן מנין מסוגל מעט מעטים מעל מצד מתחת מתי נגד נו עד על עלי עליה
עליהם עליהן עליו עליך עליכם עלינו עם עצמה עצמו עצמי עצמם עצמן עצמנו
פה רק שוב של שלה שלהם שלהן שלו שלי שלך שלכם שלכן שלנו שם תהיה תחת
""".split())

# Hinglish: NLTK's hinglish list is the english list plus romanized
# Hindi function words (pronouns, postpositions, auxiliaries,
# particles, question words and their common spelling variants).
# Only the Hindi portion lives here; stopwords.py composes it with
# ENGLISH for the "hinglish" name.
HINGLISH_HINDI = _dedup("""
main mai mujhe mujhko mera meri mere hum hame hamein humko hamara
hamari hamare tu tum tumhe tumko tera teri tere tumhara tumhari
tumhare aap aapko aapka aapki aapke yeh ye woh wo voh isse usse isko
usko iska iski iske uska uski uske inka inki inke unka unki unke is
us in un ka ki ke ko se mein me par pe tak liye lie vaste bina saath
sath andar bahar upar neeche niche aage peeche pichhe paas pas aur
ya athva evam tatha lekin magar par kintu parantu kyunki kyonki
isliye isiliye agar yadi to toh warna varna jab tab jabki jahan
wahan vahan yahan yahin wahin kab kahan kaun kaunsa kya kyun kyon
kaise kitna kitni kitne hai hain ho hoon hun tha thi the hoga hogi
honge hota hoti hote hua hui hue raha rahi rahe rahega kar karke
karna karta karti karte kiya kiye kiyo gaya gayi gaye jata jati jate
diya liya wala wali wale vala vali vale apna apni apne khud swayam
koi kisi kisiko kisika kuch kuchh sab sabhi sabka har pratyek kai
kafi bahut bohot thoda thodi thode zyada jyada adhik kam aise aisa
aisi waise waisa waisi jaise jaisa jaisi abhi ab tab phir fir bas
sirf keval matlab yani arthat bhi hi na nahi nahin mat haan han ji
accha acha theek thik are arre wagera vagera etc itna itni itne utna
utni utne jo jinhe jinka jinki jinke jise jiska jiski jiske hona
hokar hote hue karne hue
""".split())

KAZAKH = _dedup("""
ах ох эх ай эй ой тағы тағыда әрине жоқ сондай осындай осылай солай
мұндай мұнда мында осында сонда жаңа құр жай сияқты жалғыз ғана
ғанибет аз көп саны бірнеше біршама бірталай қыруар және мен бен
пен да де та те бұл ол осы сол әр бір екі үш төрт бес алты жеті
сегіз тоғыз он үшін туралы дейін кейін бірақ немесе егер қалай
қашан қайда қайдан кім кімге кімнен не неге неден несі өте емес еді
екен болды болады болған болса бар барлық барша өз өзі өзінің біз
бізге бізді біздің сіз сізге сізді сіздің олар оларға оларды
олардың мына анау осы осыған осыны осының соған соны соның қазір
сондықтан себебі арқылы бойынша дегенмен яғни алайда әйтпесе әлде
бәрі бәріне кейбір ешкім ештеңе еш әлі енді тек қана ма ме ба бе па
пе ші ғой ау ақ ды ді
""".split())

NEPALI = _dedup("""
छ र पनि छन् लागि भएको गरेको भने गर्न गर्ने हो तथा यो रहेको उनले थियो
हुने अनुसार गरी त्यो अब दुई एक मा को का की ले बाट द्वारा संग सँग
हुन् थिए तर म हामी हामीले उनी उनीहरू उनको तिमी तिमीले तपाईं तपाईंले
यी ती कुनै केही सबै धेरै थोरै अर्को अरू पछि अघि माथि तल भित्र बाहिर
कहाँ कहिले किन कसरी के कसले जो जुन जसले जसको त्यस यस उक्त भन्ने
गरेका गर्दै हुँदै भएका छु छौ छौं हुन्छ गर्छ गर्छन् गरे गरेर भए भएर
हुनु गर्नु भन्नु भन्छन् भन्यो थिएन छैन हैन होइन नै ता त चाहिँ मात्र
मात्रै समेत लगायत अनि अथवा वा कि भनेर यदि भनेपनि तापनि यसरी त्यसरी
जसरी यहाँ त्यहाँ जहाँ आफू आफ्नो आफैं उसको उसले उसलाई यसको यसले
यसलाई त्यसको त्यसले त्यसलाई मलाई मेरो हाम्रो तिम्रो तपाईंको कति
यति उति जति निकै साह्रै एकदम देखि सम्म तिर प्रति बारे बिना सहित
अनुसार क्रममा रूपमा
""".split())

SLOVENE = _dedup("""
in je na za se da so bi pa ne ki ga s z v o od do pri po če ali kot
tudi še le bo bil bila bilo bili bile smo ste sta sem si ta to te ti
tega tem tej tisti tista tisto jaz mi me moj moja moje naš naša naše
vi vas vam vaš vaša vaše on ona ono oni njegov njegova njegovo njen
njena njeno njihov njihova njihovo kdo kaj kje kam kdaj zakaj kako
kateri katera katero nekaj nekdo nič nihče vse vsak vsaka vsako vsi
ker ampak vendar torej potem zdaj sedaj tukaj tam brez med nad pod
pred čez skozi proti zaradi okoli poleg morda mogoče lahko treba ni
nismo niso nisem bova bosta bomo boste bodo ju jih jim mu ji nam jo
""".split())

TAJIK = _dedup("""
ва дар ба аз бо ки ин он барои то чун агар аммо ё ҳам низ не на буд
аст ҳаст шуд мешавад мекунад кард карда мо шумо ман ту вай онҳо худ
ҳамин ҳамон чӣ кӣ куҷо кай чаро чанд якчанд ҳар баъзе ҳама бисёр
кам дигар пас пеш баъд зери болои байни миёни бе оид доир тибқи
чунин инчунин яъне гарчанде зеро бинобар ҳатто танҳо фақат боз ҳоло
акнун ҳеҷ мебошад мебошанд буданд ҳастанд нест шудааст гардид
намуд менамояд дошт дорад доранд метавонад бояд мумкин лозим даст
сӯи тарафи назди пушти дохили хориҷи вақте ҳангоми баъди пеши аммо
вале лекин балки ҳамчун мисли монанди қадар андозаи ғайр илова
ҳамроҳи якҷоя алоҳида умуман асосан махсусан айнан маҳз
""".split())

LISTS["arabic"] = ARABIC
LISTS["azerbaijani"] = AZERBAIJANI
LISTS["basque"] = BASQUE
LISTS["bengali"] = BENGALI
LISTS["catalan"] = CATALAN
LISTS["chinese"] = CHINESE
LISTS["greek"] = GREEK
LISTS["hebrew"] = HEBREW
LISTS["kazakh"] = KAZAKH
LISTS["nepali"] = NEPALI
LISTS["slovene"] = SLOVENE
LISTS["tajik"] = TAJIK
