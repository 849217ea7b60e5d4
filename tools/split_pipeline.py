#!/usr/bin/env python3
"""One-shot code-motion: split queries/Pipeline.scala into family files
under queries/pipeline/. Pure extraction — moved text is byte-identical
except for a small explicit token-qualification list (members that stay
in Pipeline and are referenced from moved code)."""
import re, sys

SRC = 'src/main/scala/graft/queries/Pipeline.scala'
lines = open(SRC).read().split('\n')  # 0-indexed

# ---------- parse top-level members ----------
members = []  # (name, decl_line0)
for i, l in enumerate(lines):
    m = re.match(r'^  (?:private(?:\[[a-z]+\])? )?(?:final )?(?:lazy )?(?:val|def|object) (\w+)', l)
    if m:
        members.append((m.group(1), i))
member_starts = [i for _, i in members]

def back_through_comments(i):
    """Walk back over the comment/scaladoc block immediately above line i."""
    j = i
    while j > 0:
        p = lines[j - 1].strip()
        if p.startswith('//') or p.startswith('/**') or p.startswith('*') or p.startswith('*/'):
            j -= 1
        else:
            break
    return j

# member ranges: from adjusted start to line before next member's adjusted start
CLOSE = max(i for i, l in enumerate(lines) if l == '}')  # object close
ranges = {}
adj = [back_through_comments(i) for _, i in members]
for k, (name, _) in enumerate(members):
    end = adj[k + 1] - 1 if k + 1 < len(members) else CLOSE - 1
    ranges[name] = (adj[k], end)

# ---------- parse defs entries ----------
ds, de = ranges['defs']
# find actual 'val defs' decl line and the closing '  )'
defs_decl = next(i for i in range(ds, de) if lines[i].startswith('  val defs'))
defs_close = next(i for i in range(de, defs_decl, -1) if lines[i].rstrip() == '  )')
entry_starts = [i for i in range(defs_decl + 1, defs_close)
                if re.match(r'^    QueryDef', lines[i])]
entries = []  # (qname, start, end)
adj_e = [back_through_comments(i) for i in entry_starts]
for k, st in enumerate(entry_starts):
    name = None
    for j in range(st, min(st + 3, defs_close)):
        m = re.search(r'"(q\w+)"', lines[j])
        if m:
            name = m.group(1)
            break
    end = adj_e[k + 1] - 1 if k + 1 < len(entry_starts) else defs_close - 1
    entries.append((name, adj_e[k], end))

# ---------- assignments ----------
DEDUP_Q = ['q41_near_dup','q44_simhash','q45_ngram_jaccard','q54_embedding_near_dup',
  'q59_user_minhash','q98_line_dedup','q110_incremental_near_dup','q172_lsh_band_sweep',
  'q180_substring_dedup','q189_dedup_method_sweep','q197_frame_dedup',
  'q226_dup_flow_matrix','q229_lsh_planner']
DEDUP_M = ['P','K','hashA','hashB','bands','SIMBITS','SIMCHUNKS','CHUNKBITS','HAMMING_MAX',
  'NEARDUP_COS','SpanK','JaccTauMicro','minhashOracle','simhashOracle','jaccardOracle',
  'embeddingNearDupOracle','incrementalNearDupOracle','lineDedupOracle',
  'substringDedupOracle','dedupMethodSweepOracle','frameDedupOracle','userMinhashOracle',
  'dupFlowOracle','lshPlannerOracle','sqChain','lshCollisionP','LshPlannerCase',
  'sweepLayouts','lshBandSweepOracle']
RETR_Q = ['q42_topk_cosine','q46_ann_lsh','q53_topk_cosine_native','q55_ivf_ann',
  'q56_tfidf','q96_bm25','q99_inverted_index','q107_hard_negatives','q132_rrf_hybrid',
  'q138_ann_recall','q143_matryoshka_eval','q220_sq8_ann']
RETR_M = ['NCELLS','NPROBE','cosineTopkOracle','BM25_K1','BM25_B','BM25_K1P1','BM25_TERMS',
  'RRF_K','RRF_LEG_K','RRF_TOPK','ANN_RECALL_K','MrlPrefixDims','annLshOracle',
  'hardNegativesOracle','ivfAnnOracle','tfidfOracle','bm25MicroPerDoc','bm25CoreCtes',
  'bm25Oracle','annRecallOracle','matryoshkaOracle','sq8AnnOracle','rrfHybridOracle',
  'invertedIndexOracle']
TOK_Q = ['q150_bpe_train','q151_bpe_tokenize','q156_bpe_pack','q162_bpe_fertility',
  'q173_bpe_ids','q177_bpe_transfer','q192_pack_boundaries','q196_vocab_prune',
  'q205_sft_mask','q213_detok_roundtrip','q227_grad_accum','q228_merge_ablation']
TOK_M = ['BpeMerges','BpeLatin','BpeCjk','BpeDeA','BpeDeO','BpeDeU','bpeCaseSql',
  'bpeTextCol','bpeWordsCol','bpeWordHist','bpeCorpusWords','bpeApplySql','bpeFoldSql',
  'bpeTrain','bpeModelDirs','ensureBpeModel','ensureBpeEnModel','ensureBpeModelTagged',
  'bpeTokenStream','bpeDocTokens','bpeOracleText','bpeOracleWords','bpeOracleCtes',
  'bpeOracleCtesBody','bpeOracleDocCtes','bpeTrainOracle','bpeTokenizeOracle',
  'bpeFertilityOracle','bpePackOracle','bpeIdsOracle','detokRoundtripOracle',
  'sftMaskOracle','bpeTransferOracle','packBoundariesOracle','vocabPruneOracle',
  'gradAccumOracle','mergeAblationOracle']

# members that STAY in Pipeline but are referenced from moved code: qualify.
QUALIFY = ['LineWords','POSTK','BoilerMinDocs','wordFeatCol','wordFeatColOn',
  'wordFeatOracleSql','wordFeatOracleSqlOn','bigramCePerDoc','htmlCaseSql',
  'observedQualityGate','crawlKeptDocs']

def qualify(text):
    for t in QUALIFY:
        text = re.sub(r'(?<![\w.\[])' + t + r'\b', 'Pipeline.' + t, text)
    return text

ename = {n: (s, e) for n, s, e in entries}
moved_lines = set()

def grab_entries(qs):
    out = []
    for q in qs:
        s, e = ename[q]
        moved_lines.update(range(s, e + 1))
        txt = '\n'.join(lines[s:e + 1]).rstrip()
        if not txt.endswith(','):
            txt += ','
        out.append(txt)
    return out

def grab_members(ms):
    out = []
    for m in ms:
        s, e = ranges[m]
        moved_lines.update(range(s, e + 1))
        out.append('\n'.join(lines[s:e + 1]).rstrip())
    return out

HEADER = '''package graft.queries

import org.apache.spark.sql.{{Column, DataFrame, SparkSession}}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

{doc}
object {obj} {{

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
'''

def emit(path, obj, doc, pre_vals, qs, post_defs, extra=''):
    parts = [HEADER.format(obj=obj, doc=doc)]
    if extra:
        parts.append(extra)
    if pre_vals:
        parts.append(qualify('\n\n'.join(grab_members(pre_vals))))
    parts.append('  val defs: Seq[QueryDef] = Seq(\n')
    parts.append(qualify('\n\n'.join(grab_entries(qs))))
    parts.append('\n  )')
    if post_defs:
        parts.append(qualify('\n\n'.join(grab_members(post_defs))))
    open(path, 'w').write('\n'.join(parts) + '\n}\n')

pre = lambda ms: [m for m in ms if ranges[m][0] < defs_decl]
post = lambda ms: [m for m in ms if ranges[m][0] > defs_close]

GRID = '''  private val TABLES = graft.functions.Sketches.TABLES
  private val PLANES = graft.functions.Sketches.PLANES
  private val DIM = graft.functions.Sketches.DIM
'''

emit('src/main/scala/graft/queries/pipeline/PipelineDedup.scala', 'PipelineDedup',
     '''/** Near-duplicate detection family (SURVEY §7.5 dedup): MinHash-LSH,
  * SimHash, n-gram Jaccard, embedding LSH, incremental/band-index,
  * substring/line/frame dedup, the cross-method sweep and the LSH
  * planner. Split out of Pipeline.scala (round 18) — pure code motion;
  * every oracle and kernel is unchanged. Shared sketch constants come
  * from graft.functions.Sketches (the no-drift rule). */''',
     pre(DEDUP_M), DEDUP_Q, post(DEDUP_M), GRID)

emit('src/main/scala/graft/queries/pipeline/PipelineRetrieval.scala', 'PipelineRetrieval',
     '''/** Retrieval / similarity-search family (SURVEY §7.5 ANN + ranking):
  * exact cosine top-k, LSH/IVF/PQ-adjacent ANN legs, TF-IDF, BM25, RRF
  * hybrid fusion, inverted index, and the recall eval harnesses. Split
  * out of Pipeline.scala (round 18) — pure code motion. */''',
     pre(RETR_M), RETR_Q, post(RETR_M), GRID)

emit('src/main/scala/graft/queries/pipeline/PipelineTokenizer.scala', 'PipelineTokenizer',
     '''/** Tokenizer family (SURVEY §7.5 tokenizers): BPE training/apply/
  * transfer/ablation, packing, SFT masking, detokenization roundtrip,
  * vocab pruning and the grad-accum schedule. The stored BPE model
  * artifacts (ensureBpeModel) live here. Split out of Pipeline.scala
  * (round 18) — pure code motion. */''',
     pre(TOK_M), TOK_Q, post(TOK_M))

# ---------- rewrite Pipeline.scala without moved ranges ----------
kept = [l for i, l in enumerate(lines) if i not in moved_lines]
open(SRC, 'w').write('\n'.join(kept))
print('moved', len(moved_lines), 'lines; Pipeline now', len(kept), 'lines')
print('entries moved:', len(DEDUP_Q) + len(RETR_Q) + len(TOK_Q),
      'members moved:', len(DEDUP_M) + len(RETR_M) + len(TOK_M))
