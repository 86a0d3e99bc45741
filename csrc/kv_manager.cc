// Native paged-KV block manager: free-list allocator + radix-tree prefix
// cache with ref-counting and LRU eviction.
//
// C++ port of vyomai_tpu/serving/kv_manager.py (same ownership protocol —
// see that file's docstring). The host scheduler is on the serving hot path
// at high request rates (radix walks + LRU bookkeeping per admission /
// retirement), which is why the runtime piece is native; the Python class
// remains as the reference implementation and fallback.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC kv_manager.cc -o libkvmanager.so

#include <cstdint>
#include <cstring>
#include <deque>
#include <list>
#include <map>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

using Chunk = std::vector<int64_t>;

struct Node {
  std::map<Chunk, std::unique_ptr<Node>> children;
  Node* parent = nullptr;
  Chunk key;
  int block = -1;
  int refcount = 0;
  // position in the LRU list when evictable (refcount==0 leaf)
  bool in_lru = false;
  std::list<Node*>::iterator lru_it;
};

struct Sequence {
  std::vector<int64_t> tokens;
  int prompt_len = 0;
  std::vector<int> block_table;
  std::vector<Node*> cached_nodes;
  int num_cached_tokens = 0;
};

struct Manager {
  int num_blocks;
  int block_size;
  std::deque<int> free_blocks;
  Node root;
  std::list<Node*> lru;  // oldest at front
  int idle_radix_blocks = 0;
  std::unordered_map<int64_t, Sequence> seqs;
  // observability counters (kvm_stats; mirrored in kv_manager.py)
  int64_t radix_lookups = 0;    // match_prefix calls
  int64_t radix_hits = 0;       // lookups that matched >= 1 block
  int64_t radix_hit_blocks = 0; // total blocks served from the cache
  int64_t radix_evictions = 0;  // blocks reclaimed from the radix tree

  explicit Manager(int nb, int bs) : num_blocks(nb), block_size(bs) {
    for (int i = 0; i < nb; ++i) free_blocks.push_back(i);
  }

  void lru_push(Node* n) {
    if (n->in_lru) lru.erase(n->lru_it);
    lru.push_back(n);
    n->lru_it = std::prev(lru.end());
    n->in_lru = true;
  }

  void lru_remove(Node* n) {
    if (n->in_lru) {
      lru.erase(n->lru_it);
      n->in_lru = false;
    }
  }

  void acquire(Node* n) {
    if (n->refcount == 0) --idle_radix_blocks;
    ++n->refcount;
    lru_remove(n);
  }

  void release(Node* n) {
    --n->refcount;
    if (n->refcount == 0) {
      ++idle_radix_blocks;
      if (n->children.empty()) lru_push(n);
    }
  }

  int evict_one() {
    while (!lru.empty()) {
      Node* n = lru.front();
      lru.pop_front();
      n->in_lru = false;
      if (n->refcount > 0 || !n->children.empty()) continue;  // stale
      int block = n->block;
      Node* p = n->parent;
      if (p != nullptr) {
        p->children.erase(n->key);  // destroys n
        if (p != &root && p->refcount == 0 && p->children.empty())
          lru_push(p);
      }
      --idle_radix_blocks;
      ++radix_evictions;
      return block;
    }
    return -1;
  }

  int allocate_block() {
    if (!free_blocks.empty()) {
      int b = free_blocks.front();
      free_blocks.pop_front();
      return b;
    }
    return evict_one();
  }

  int num_free() const {
    return static_cast<int>(free_blocks.size()) + idle_radix_blocks;
  }

  int blocks_needed(int num_tokens) const {
    return (num_tokens + block_size - 1) / block_size;
  }

  int match_prefix(Sequence& s) {
    Node* node = &root;
    int n_prompt = s.prompt_len;
    for (int i = 0; i + block_size <= n_prompt; i += block_size) {
      Chunk chunk(s.tokens.begin() + i, s.tokens.begin() + i + block_size);
      auto it = node->children.find(chunk);
      if (it == node->children.end()) break;
      Node* child = it->second.get();
      acquire(child);
      s.cached_nodes.push_back(child);
      s.block_table.push_back(child->block);
      node = child;
    }
    // keep at least one prompt token for prefill
    if (!s.cached_nodes.empty() &&
        static_cast<int>(s.cached_nodes.size()) * block_size >= n_prompt) {
      Node* last = s.cached_nodes.back();
      s.cached_nodes.pop_back();
      s.block_table.pop_back();
      release(last);
    }
    s.num_cached_tokens =
        static_cast<int>(s.cached_nodes.size()) * block_size;
    ++radix_lookups;
    if (s.num_cached_tokens > 0) ++radix_hits;
    radix_hit_blocks += static_cast<int64_t>(s.cached_nodes.size());
    return s.num_cached_tokens;
  }

  // Longest cached prefix WITHOUT acquiring refs or touching LRU order —
  // the scheduler's cache-aware-admission probe. Applies the same
  // never-cover-the-entire-prompt cap as match_prefix.
  int peek_prefix(const int64_t* prompt, int n) const {
    const Node* node = &root;
    int covered = 0;
    for (int i = 0; i + block_size <= n; i += block_size) {
      Chunk chunk(prompt + i, prompt + i + block_size);
      auto it = node->children.find(chunk);
      if (it == node->children.end()) break;
      node = it->second.get();
      covered += block_size;
    }
    if (covered >= n && n > 0) covered -= block_size;
    return covered < 0 ? 0 : covered;
  }

  bool allocate(Sequence& s, int num_tokens) {
    int need = blocks_needed(num_tokens) -
               static_cast<int>(s.block_table.size());
    // Pre-check before touching the radix cache: the eviction loop
    // destroys cached entries as it reclaims them, so a doomed allocation
    // must not run it (mirrors kv_manager.py).
    if (need > num_free()) return false;
    std::vector<int> got;
    for (int i = 0; i < need; ++i) {
      int b = allocate_block();
      if (b < 0) {
        for (int g : got) free_blocks.push_back(g);
        return false;
      }
      got.push_back(b);
    }
    s.block_table.insert(s.block_table.end(), got.begin(), got.end());
    return true;
  }

  void free_seq(Sequence& s, bool cache_prefix) {
    int n_cached = static_cast<int>(s.cached_nodes.size());
    for (Node* n : s.cached_nodes) release(n);
    // Only tokens with WRITTEN KV may be promoted: the engine appends each
    // sampled token before the step that writes its KV, so the final token
    // of a finished sequence has no pool entry (mirrors kv_manager.py).
    int n_written = static_cast<int>(s.tokens.size());
    if (n_written > 0) n_written -= 1;
    int n_full = n_written / block_size;
    int owned_full_count = n_full - n_cached;
    if (owned_full_count < 0) owned_full_count = 0;
    std::vector<int> owned(s.block_table.begin() + n_cached,
                           s.block_table.end());
    std::vector<int> owned_full(owned.begin(),
                                owned.begin() + std::min<size_t>(
                                    owned_full_count, owned.size()));
    std::vector<int> tail(owned.begin() + owned_full.size(), owned.end());

    if (cache_prefix && !owned_full.empty()) {
      Node* node = &root;
      bool walk_ok = true;
      for (int i = 0; i < n_cached; ++i) {
        Chunk chunk(s.tokens.begin() + i * block_size,
                    s.tokens.begin() + (i + 1) * block_size);
        auto it = node->children.find(chunk);
        if (it == node->children.end()) {
          // broken walk: skip caching (re-rooting would key mid-sequence
          // chunks at depth 0 — wrong-position KV for future matches)
          walk_ok = false;
          break;
        }
        node = it->second.get();
      }
      if (!walk_ok) {
        for (int b : owned_full) free_blocks.push_back(b);
        owned_full.clear();
      }
      for (size_t j = 0; j < owned_full.size(); ++j) {
        int i = n_cached + static_cast<int>(j);
        Chunk chunk(s.tokens.begin() + i * block_size,
                    s.tokens.begin() + (i + 1) * block_size);
        auto it = node->children.find(chunk);
        if (it == node->children.end()) {
          auto child = std::make_unique<Node>();
          child->parent = node;
          child->key = chunk;
          child->block = owned_full[j];
          Node* cp = child.get();
          node->children[chunk] = std::move(child);
          ++idle_radix_blocks;
          lru_push(cp);
          if (node != &root) lru_remove(node);
          node = cp;
        } else {
          free_blocks.push_back(owned_full[j]);  // duplicate prefix
          node = it->second.get();
        }
      }
    } else {
      for (int b : owned_full) free_blocks.push_back(b);
    }
    for (int b : tail) free_blocks.push_back(b);
    s.block_table.clear();
    s.cached_nodes.clear();
  }
};

}  // namespace

extern "C" {

void* kvm_create(int num_blocks, int block_size) {
  return new Manager(num_blocks, block_size);
}

void kvm_destroy(void* m) { delete static_cast<Manager*>(m); }

int kvm_num_free(void* m) { return static_cast<Manager*>(m)->num_free(); }

// Register a sequence with its prompt; returns num_cached_tokens after the
// radix prefix match.
int kvm_begin(void* m, int64_t seq_id, const int64_t* prompt, int n) {
  auto* mgr = static_cast<Manager*>(m);
  Sequence& s = mgr->seqs[seq_id];
  s.tokens.assign(prompt, prompt + n);
  s.prompt_len = n;
  return mgr->match_prefix(s);
}

// Grow the block table to cover num_tokens; returns 1 on success.
int kvm_allocate(void* m, int64_t seq_id, int num_tokens) {
  auto* mgr = static_cast<Manager*>(m);
  auto it = mgr->seqs.find(seq_id);
  if (it == mgr->seqs.end()) return 0;
  return mgr->allocate(it->second, num_tokens) ? 1 : 0;
}

void kvm_append_token(void* m, int64_t seq_id, int64_t token) {
  auto* mgr = static_cast<Manager*>(m);
  auto it = mgr->seqs.find(seq_id);
  if (it != mgr->seqs.end()) it->second.tokens.push_back(token);
}

// Copy the block table into out (capacity cap); returns the count.
int kvm_block_table(void* m, int64_t seq_id, int* out, int cap) {
  auto* mgr = static_cast<Manager*>(m);
  auto it = mgr->seqs.find(seq_id);
  if (it == mgr->seqs.end()) return 0;
  auto& bt = it->second.block_table;
  int n = static_cast<int>(bt.size());
  if (n > cap) n = cap;
  std::memcpy(out, bt.data(), n * sizeof(int));
  return n;
}

int kvm_num_cached_tokens(void* m, int64_t seq_id) {
  auto* mgr = static_cast<Manager*>(m);
  auto it = mgr->seqs.find(seq_id);
  return it == mgr->seqs.end() ? 0 : it->second.num_cached_tokens;
}

// Longest cached prefix for a prospective prompt (no side effects).
int kvm_peek(void* m, const int64_t* prompt, int n) {
  return static_cast<Manager*>(m)->peek_prefix(prompt, n);
}

// Observability: out[0..3] = lookups, hits, hit_blocks, evictions.
void kvm_stats(void* m, int64_t* out) {
  auto* mgr = static_cast<Manager*>(m);
  out[0] = mgr->radix_lookups;
  out[1] = mgr->radix_hits;
  out[2] = mgr->radix_hit_blocks;
  out[3] = mgr->radix_evictions;
}

// Release the sequence's blocks (promoting full blocks into the radix
// cache when cache_prefix) and forget the sequence.
void kvm_free(void* m, int64_t seq_id, int cache_prefix) {
  auto* mgr = static_cast<Manager*>(m);
  auto it = mgr->seqs.find(seq_id);
  if (it == mgr->seqs.end()) return;
  mgr->free_seq(it->second, cache_prefix != 0);
  mgr->seqs.erase(it);
}

}  // extern "C"
