// Vendored DOCUMENTATION text (not built here — this image has no Rust
// toolchain): the ~30-line driver that closes the interop loop against
// the reference crate `bp-pp` v0.1.1 using interop/u64_case.json from
// `python tools/rust_interop.py export`.
//
//   cargo new interop && cd interop
//   cargo add bp-pp k256 merlin serde_json rand_core hex
//   cp ../interop/u64_case.json src/  &&  (this file -> src/main.rs)
//   cargo run   # prints "verify: true" and "prove bit-exact: true"
//
// Direction B's bit-exactness relies on the draw-stream contract in
// bppp_tpu/utils/rng.py: one Scalar::generate_biased draw consumes one
// 64-byte block via RngCore::fill_bytes, wide-reduced mod n.

use bp_pp::range_proof::u64_proof::U64RangeProofProtocol;
use bp_pp::range_proof::reciprocal::SerializableProof;
use k256::elliptic_curve::group::GroupEncoding;
use k256::ProjectivePoint;
use merlin::Transcript;

struct ReplayRng { blocks: Vec<Vec<u8>>, pos: usize }
impl rand_core::RngCore for ReplayRng {
    fn fill_bytes(&mut self, dest: &mut [u8]) {
        // generate_biased requests exactly 64 bytes per scalar draw
        dest.copy_from_slice(&self.blocks[self.pos][..dest.len()]);
        self.pos += 1;
    }
    fn next_u32(&mut self) -> u32 { unreachable!() }
    fn next_u64(&mut self) -> u64 { unreachable!() }
    fn try_fill_bytes(&mut self, d: &mut [u8]) -> Result<(), rand_core::Error> {
        self.fill_bytes(d); Ok(())
    }
}
impl rand_core::CryptoRng for ReplayRng {}

fn point(hex: &str) -> ProjectivePoint {
    let b = hex::decode(hex).unwrap();
    ProjectivePoint::from_bytes(b.as_slice().into()).unwrap()
}

fn main() {
    let case: serde_json::Value =
        serde_json::from_str(include_str!("u64_case.json")).unwrap();
    let protocol = U64RangeProofProtocol {
        g: point(case["g"].as_str().unwrap()),
        g_vec: case["g_vec"].as_array().unwrap().iter()
            .map(|v| point(v.as_str().unwrap())).collect(),
        h_vec: case["h_vec"].as_array().unwrap().iter()
            .map(|v| point(v.as_str().unwrap())).collect(),
    };
    let v = point(case["commitment"].as_str().unwrap());
    let proof: SerializableProof =
        serde_json::from_value(case["proof"].clone()).unwrap();

    // A) the reference verifies OUR proof
    let mut t = Transcript::new(b"u64 range proof");
    println!("verify: {}", protocol.verify(&v, proof.clone().into(), &mut t));

    // B) the reference REPRODUCES our proof bit-exact from the stream
    let mut rng = ReplayRng {
        blocks: case["draw_blocks"].as_array().unwrap().iter()
            .map(|v| hex::decode(v.as_str().unwrap()).unwrap()).collect(),
        pos: 0,
    };
    let x = case["x"].as_u64().unwrap();
    let s = k256::Scalar::from_repr(
        hex::decode(case["s"].as_str().unwrap()).unwrap().as_slice().into()
    ).unwrap();
    let mut t2 = Transcript::new(b"u64 range proof");
    let ours = protocol.prove(x, &s, &mut t2, &mut rng);
    let ours_json = serde_json::to_value(SerializableProof::from(&ours)).unwrap();
    println!("prove bit-exact: {}", ours_json == case["proof"]);
}
